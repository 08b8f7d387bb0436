from .fused_mlp import FusedMLPParams, fused_mlp, fused_mlp_available

__all__ = ["fused_mlp", "FusedMLPParams", "fused_mlp_available"]
