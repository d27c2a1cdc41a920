"""Numeric ops: masked-softmax semantics, metrics, Pallas kernels."""

from .masked import masked_softmax, nan_to_num, masked_mean_pool  # noqa: F401
from .metrics import (  # noqa: F401
    accuracy,
    macro_f1,
    expected_calibration_error,
    maximum_calibration_error,
    negative_log_likelihood,
    cross_entropy_loss,
)
