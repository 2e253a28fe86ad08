"""Renderers: single-volume (cr+distant+sky) and multi-object buffer compose."""
from .buffers import volume_integrate, merge_and_integrate
from .single_volume import SingleVolumeRenderer
from .buffer_compose import BufferComposeRenderer, ObjectBinding, render_instance_segmentation
