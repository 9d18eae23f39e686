"""Backend-family dispatch helper.

The Pallas fast paths in this package lower Mosaic/TPU kernels
(``pltpu.*``); they are correct on TPU only. The axon transport exposes
the chip under a platform name other than ``"tpu"``, so a plain
``jax.default_backend() == "tpu"`` test would silently skip the fast
path on the one real chip, while the old ``!= "cpu"`` test would try
(and fail) to lower Mosaic kernels on a GPU backend (advisor round-3
finding). This helper names TPU-family platforms explicitly.
"""

from __future__ import annotations

import jax

# Platform names under which jax drives a real TPU. "axon" is the
# tunneled single-chip transport used in this environment.
_TPU_PLATFORMS = ("tpu", "axon")


def is_tpu_backend() -> bool:
    """True when the default backend lowers to a TPU (incl. axon tunnel).

    Gates the Mosaic/Pallas fast paths: on CPU the XLA reference path is
    used (or interpret mode in tests); on GPU and any other accelerator
    the XLA path is the correct fallback because ``pltpu`` kernels cannot
    lower there.
    """
    backend = jax.default_backend()
    if backend in _TPU_PLATFORMS:
        return True
    try:
        return jax.devices()[0].platform in _TPU_PLATFORMS
    except RuntimeError:
        return False
