from .misc import (
    IDListedDict,
    import_str,
    collate_nested_dict,
    nested_dict_items,
    zip_two_nested_dict,
    to_device_tree,
    tensor_statistics,
)
