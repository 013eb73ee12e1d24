"""Warning/exception types. Reference: ``src/qinfer/_exceptions.py``."""


class ApproximationWarning(Warning):
    """Flags degraded approximation quality (e.g. low ESS, weight collapse).

    Reference: ``_exceptions.py — ApproximationWarning``.
    """


class ResamplerWarning(Warning):
    """Flags resampler irregularities (e.g. postselection exhaustion).

    Reference: ``_exceptions.py — ResamplerWarning`` [unverified name].
    """


class ResamplerError(RuntimeError):
    """Raised when resampling cannot produce valid particles."""
