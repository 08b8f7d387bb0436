"""Running-average meters for per-iteration telemetry.

Equivalent of the reference's RunningAverageMeter
(/root/reference/examples-pnode/ode_demo_petsc.py:233-249 and
/root/reference/ffjord-pnode/lib/utils.py:61-77): EMA of wall-clock and loss
values printed in the Iter | Time | Loss | NFE-F | NFE-B schema.
"""

from __future__ import annotations


class RunningAverageMeter:
    """Tracks an exponential moving average of a scalar."""

    def __init__(self, momentum: float = 0.99):
        self.momentum = momentum
        self.reset()

    def reset(self):
        self.val = None
        self.avg = 0.0

    def update(self, val: float):
        if self.val is None:
            self.avg = float(val)
        else:
            self.avg = self.avg * self.momentum + float(val) * (1 - self.momentum)
        self.val = float(val)
