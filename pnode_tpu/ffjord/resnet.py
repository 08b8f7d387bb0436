"""ResNet feature blocks from the reference's flow layer zoo.

Rebuild of /root/reference/ffjord-pnode/lib/layers/resnet.py:5-56:
``BasicBlock`` (3x3 conv - GroupNorm(2) - ReLU - 3x3 conv - GroupNorm(2) +
identity skip, final ReLU) and ``ResNeXtBottleneck`` (1x1 reduce - grouped
3x3 - 1x1 expand with BatchNorms, type-C ResNeXt). NHWC layout; plain
feature extractors (no log-density bookkeeping), exactly as in the
reference where they back hybrid flow experiments.
"""

from __future__ import annotations

import flax.linen as nn


class BasicBlock(nn.Module):
    """conv3x3 -> GN(2) -> ReLU -> conv3x3 -> GN(2) -> +x -> ReLU."""

    dim: int
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (3, 3), padding="SAME", use_bias=False)(x)
        h = nn.GroupNorm(num_groups=2, epsilon=1e-4)(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (3, 3), padding="SAME", use_bias=False)(h)
        h = nn.GroupNorm(num_groups=2, epsilon=1e-4)(h)
        return nn.relu(h + x)


class ResNeXtBottleneck(nn.Module):
    """ResNeXt type-C bottleneck (resnet.py:32-56): 1x1 reduce to
    cardinality*base_depth channels, grouped 3x3, 1x1 expand back to dim,
    identity skip. BatchNorm stats live in the flax ``batch_stats``
    collection (pass ``mutable=["batch_stats"]`` while training)."""

    dim: int
    cardinality: int = 4
    base_depth: int = 32

    @nn.compact
    def __call__(self, x, training: bool = True):
        D = self.cardinality * self.base_depth
        bn = lambda: nn.BatchNorm(use_running_average=not training,
                                  epsilon=1e-5)
        h = nn.Conv(D, (1, 1), use_bias=False)(x)
        h = nn.relu(bn()(h))
        h = nn.Conv(D, (3, 3), padding="SAME",
                    feature_group_count=self.cardinality, use_bias=False)(h)
        h = nn.relu(bn()(h))
        h = nn.Conv(self.dim, (1, 1), use_bias=False)(h)
        h = bn()(h)
        return nn.relu(h + x)
