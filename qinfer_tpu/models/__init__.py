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
from .derived import (
    BinomialModel,
    DerivedModel,
    DifferentiableBinomialModel,
    GaussianRandomWalkModel,
    MLEModel,
    MultinomialModel,
    PoisonedModel,
    RandomWalkModel,
    ReferencedPoissonModel,
)
from .rb import RandomizedBenchmarkingModel
from .ale import ALEApproximateModel, binom_est_error, binom_est_p
from .accelerated import AcceleratedPrecessionModel

__all__ = [
    "AcceleratedPrecessionModel",
    "DerivedModel",
    "BinomialModel",
    "DifferentiableBinomialModel",
    "MultinomialModel",
    "PoisonedModel",
    "RandomWalkModel",
    "GaussianRandomWalkModel",
    "MLEModel",
    "ReferencedPoissonModel",
    "RandomizedBenchmarkingModel",
    "ALEApproximateModel",
    "binom_est_p",
    "binom_est_error",
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
