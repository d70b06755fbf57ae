from .checkpoint import save_checkpoint, load_checkpoint
from .ida import inverse_distance_interpolate
from . import scalars

__all__ = ["save_checkpoint", "load_checkpoint", "inverse_distance_interpolate",
           "scalars"]


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU-class device (incl. the
    axon tunnel plugin) — used for platform-aware solver defaults.  CPU
    and GPU report False; failures (no backend) report False."""
    try:
        import jax

        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False
