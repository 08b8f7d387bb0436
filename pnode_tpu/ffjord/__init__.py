"""FFJORD continuous normalizing flows, TPU-native.

Rebuild of the reference's ffjord-pnode application stack
(/root/reference/ffjord-pnode/): time-dependent diffeq layer zoo, ODE
dynamics with stochastic (Hutchinson) or exact divergence, the CNF layer
integrating (z, logp, regularizations) through the pnode_tpu solver with
discrete-adjoint gradients, flow containers, and model builders.
"""

from .layers import DIFFEQ_LAYERS, build_diffeq_layer
from .odefunc import (
    ODEnet,
    AutoencoderDiffEqNet,
    autoencoder_divergence_fn,
    divergence_approx_fn,
    divergence_bf_fn,
)
from .cnf import CNF
from .other_flows import (
    BruteForceLayer,
    CouplingLayer,
    MaskedCouplingLayer,
    PlanarFlow,
    SpectralDense,
)
from .flows import SequentialFlow, LogitTransform, SigmoidTransform, ZeroMeanTransform, MovingBatchNorm
from .regularization import REGULARIZATION_FNS
from .model_builders import build_model_tabular, standard_normal_logprob

__all__ = [
    "DIFFEQ_LAYERS",
    "build_diffeq_layer",
    "ODEnet",
    "AutoencoderDiffEqNet",
    "autoencoder_divergence_fn",
    "divergence_approx_fn",
    "divergence_bf_fn",
    "CNF",
    "BruteForceLayer",
    "CouplingLayer",
    "MaskedCouplingLayer",
    "PlanarFlow",
    "SpectralDense",
    "SequentialFlow",
    "LogitTransform",
    "SigmoidTransform",
    "ZeroMeanTransform",
    "MovingBatchNorm",
    "REGULARIZATION_FNS",
    "build_model_tabular",
    "standard_normal_logprob",
]
