from .sinode import (
    CircularConv1D,
    StackedMLP,
    FusedStackedMLP,
    KSFuncIM,
    KSFuncEX,
    KSSnodeFunc,
    KSMLPFunc,
    BurgersFuncIM,
    BurgersFuncEX,
    ks_fixed_kernel,
    burgers_fixed_kernel,
)

__all__ = [
    "CircularConv1D",
    "StackedMLP",
    "FusedStackedMLP",
    "KSFuncIM",
    "KSFuncEX",
    "KSSnodeFunc",
    "KSMLPFunc",
    "BurgersFuncIM",
    "BurgersFuncEX",
    "ks_fixed_kernel",
    "burgers_fixed_kernel",
]
