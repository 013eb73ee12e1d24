"""Model DSL and concrete model families."""

from .base import (
    DifferentiableModel,
    FiniteOutcomeModel,
    Model,
    Simulatable,
    expparams_field,
)
from .test_models import (
    CoinModel,
    KnownT2PrecessionModel,
    MultiCosModel,
    NDieModel,
    NoisyCoinModel,
    SimpleInversionModel,
    SimplePrecessionModel,
)

__all__ = [
    "Simulatable",
    "Model",
    "FiniteOutcomeModel",
    "DifferentiableModel",
    "expparams_field",
    "SimplePrecessionModel",
    "SimpleInversionModel",
    "CoinModel",
    "NoisyCoinModel",
    "NDieModel",
    "MultiCosModel",
    "KnownT2PrecessionModel",
]
