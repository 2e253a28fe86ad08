from .annealers import get_anneal_val, make_annealer
