from .checkpoint import save_checkpoint, load_checkpoint
from .ida import inverse_distance_interpolate

__all__ = ["save_checkpoint", "load_checkpoint", "inverse_distance_interpolate"]
