"""PMMH subpackage.

The subpackage name collides with the public ``pmmh()`` entry point
(the reference exports a function named ``pmmh``, /root/reference/NAMESPACE:6).
Importing any submodule (``bayesssm_tpu.pmmh.driver``) binds this module
object as the ``pmmh`` attribute of the top-level package, shadowing the
lazy function export — so we make the module itself callable, delegating
to ``driver.pmmh``. Both ``bayesssm_tpu.pmmh(...)`` and
``bayesssm_tpu.pmmh.driver`` work regardless of import order.
"""

import sys as _sys
import types as _types

from bayesssm_tpu.pmmh.transforms import (
    transform_params,
    back_transform_params,
    log_jacobian,
    resolve_transforms,
)
from bayesssm_tpu.pmmh.tuning import default_tune_control, TuneControl
from bayesssm_tpu.pmmh.driver import pmmh

__all__ = [
    "transform_params",
    "back_transform_params",
    "log_jacobian",
    "resolve_transforms",
    "default_tune_control",
    "TuneControl",
    "pmmh",
]


class _CallableModule(_types.ModuleType):
    """Module that forwards calls to :func:`bayesssm_tpu.pmmh.driver.pmmh`."""

    def __call__(self, *args, **kwargs):
        return pmmh(*args, **kwargs)


_sys.modules[__name__].__class__ = _CallableModule
