"""Kernel registry.

Every feature calculator registers itself here with its metadata:

* ``fctype`` — "simple" (scalar per parameter set) or "combiner" (evaluates a
  whole parameter list in one pass to share expensive intermediates, e.g. one
  FFT for 400 coefficients).  Same two-type architecture as the reference
  (/root/reference/tsfresh/feature_extraction/feature_calculators.py:4-17,
  :222-235) — it is the reference's single biggest perf idea and we keep it.
* ``minimal`` / ``high_comp_cost`` — drive the settings cost classes.
* ``input`` — "series" when the kernel needs a pandas Series with the sort
  index attached (pandas-specific semantics or timestamp access); plain
  numpy otherwise.
* ``requires_timestamps`` — kernel is only defined for datetime-indexed data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable


@dataclass(frozen=True)
class KernelInfo:
    func: Callable
    fctype: str  # "simple" | "combiner"
    minimal: bool = False
    high_comp_cost: bool = False
    input: str = "numpy"  # "numpy" | "series"
    requires_timestamps: bool = False
    available: bool = True


KERNELS: dict[str, KernelInfo] = {}


def kernel(
    name: str,
    fctype: str,
    *,
    minimal: bool = False,
    high_comp_cost: bool = False,
    input: str = "numpy",
    requires_timestamps: bool = False,
    available: bool = True,
):
    """Decorator registering a feature kernel under ``name``."""

    def wrap(func: Callable) -> Callable:
        KERNELS[name] = KernelInfo(
            func=func,
            fctype=fctype,
            minimal=minimal,
            high_comp_cost=high_comp_cost,
            input=input,
            requires_timestamps=requires_timestamps,
            available=available,
        )
        return func

    return wrap


def get_kernel(name: str) -> KernelInfo:
    try:
        return KERNELS[name]
    except KeyError:
        raise ValueError(f"unknown feature calculator {name!r}") from None
