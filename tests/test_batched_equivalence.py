"""The grid-batched fast paths must be bit-identical to per-parameter
scalar kernel calls."""

import numpy as np
import pytest

from tsfresh_spark.extract import _BATCHED_SIMPLE
from tsfresh_spark.kernels import KERNELS
from tsfresh_spark.naming import encode_parameters
from tsfresh_spark.settings import comprehensive_settings


@pytest.mark.parametrize("name", sorted(_BATCHED_SIMPLE))
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batched_matches_scalar(name, seed):
    rng = np.random.RandomState(seed)
    cases = [
        rng.randint(0, 50257, 257).astype(np.int64),
        rng.randn(64),
        np.ones(10),
        np.arange(5, dtype=float),
    ]
    params = comprehensive_settings()[name]
    scalar = KERNELS[name].func
    batched = _BATCHED_SIMPLE[name]
    for x in cases:
        got = dict(batched(x, params))
        for p in params:
            want = scalar(x, **p)
            g = got[encode_parameters(p)]
            if isinstance(want, (bool, np.bool_)):
                assert bool(g) == bool(want), (name, p)
            elif np.isnan(float(want)):
                assert np.isnan(float(g)), (name, p)
            else:
                assert float(g) == float(want), (name, p, float(g), float(want))
