"""Pallas one-hot row-gather kernel vs the XLA one-hot matmul fallback.

The kernel (ops/pallas_select.py) must produce EXACT row copies — both
routes copy f32 rows bit-for-bit (the one-hot dot accumulates exactly one
term), so equality is exact, not approximate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from phdslam_tpu.ops.pallas_select import (onehot_cols_batch,
                                           onehot_cols_xla,
                                           onehot_rows_batch,
                                           onehot_rows_xla)

INTERPRET = True  # CPU CI: run the Mosaic kernel in interpret mode


@pytest.mark.parametrize("P,cap,R,C", [
    (16, 64, 32, 16),     # K-table shape class
    (16, 64, 8, 8),       # M-table shape class (small R)
    (5, 33, 7, 3),        # ragged: P not a block multiple, odd dims
    (1, 8, 4, 2),         # single particle
])
def test_rows_match_xla(P, cap, R, C):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, R, (P, cap)), jnp.int32)
    tab = jnp.asarray(rng.normal(size=(P, R, C)).astype(np.float32))
    out_k = onehot_rows_batch(idx, tab, interpret=INTERPRET)
    out_x = onehot_rows_xla(idx, tab)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(out_x))
    # spot-check against a plain numpy gather
    ref = np.take_along_axis(np.asarray(tab),
                             np.asarray(idx)[:, :, None], axis=1)
    np.testing.assert_array_equal(np.asarray(out_k), ref)


@pytest.mark.parametrize("P,cap,R,C", [
    (16, 64, 32, 16),
    (5, 33, 7, 3),
    (1, 8, 4, 2),
])
def test_cols_match_xla(P, cap, R, C):
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, R, (P, cap)), jnp.int32)
    tab_t = jnp.asarray(rng.normal(size=(P, C, R)).astype(np.float32))
    out_k = onehot_cols_batch(idx, tab_t, interpret=INTERPRET)
    out_x = onehot_cols_xla(idx, tab_t)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(out_x))
    ref = np.take_along_axis(
        np.asarray(tab_t),
        np.broadcast_to(np.asarray(idx)[:, None, :], (P, C, cap)), axis=2)
    np.testing.assert_array_equal(np.asarray(out_k), ref)
