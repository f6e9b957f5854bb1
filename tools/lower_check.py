"""Mosaic lowering regression check for every Pallas kernel at every
shipped problem shape.

The CPU test suite runs the kernels in interpret mode, which skips Mosaic
lowering entirely — a kernel can pass all tests yet fail to compile at
dense shapes (this caught us once: the detect kernel's 8-particle block
exceeded scoped VMEM at K=1024, and chunked lane-slices of loaded values
lowered to unsupported gathers). Lowering happens host-side against the
TPU target, so this check is fast (~1 min) and needs no device execution.

Run after any kernel edit:  python tools/lower_check.py
Exits non-zero on the first lowering failure.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def check(name, fn, *args):
    try:
        jax.jit(fn).lower(*args)
        print(f"  ok  {name}")
        return True
    except Exception:
        print(f"FAIL  {name}")
        print(traceback.format_exc()[-1500:])
        return False


def main():
    if jax.default_backend() not in ("tpu", "axon"):
        print("needs a TPU-target backend to lower Mosaic; skipping")
        return 0

    from phdslam_tpu.ops.pallas_detect import detection_topT_batch
    from phdslam_tpu.ops.pallas_merge import (gm_merge_pallas_batch_packed,
                                              gm_merge_pallas_batch_packed_4d,
                                              gm_merge_pallas_batch_tables)
    from phdslam_tpu.ops.pallas_select import (onehot_cols_batch,
                                               onehot_rows_batch)

    # (label, K features, M measurements, cap lanes, T topk, out K)
    shapes = [
        ("ackerman", 128, 64, 512, 16, 128),
        ("dense", 1024, 96, 1536, 32, 1024),
    ]
    ok = True
    P = 16
    for label, K, M, cap, T, out_k in shapes:
        planes = jnp.zeros((P, 6, K), jnp.float32)
        z4 = jnp.zeros((M, 4), jnp.float32)
        ok &= check(f"detect_topT [{label}]",
                    lambda p, z=z4, t=T: detection_topT_batch(
                        p, z, t, 1e-6, 0.1), planes)

        idx = jnp.zeros((P, cap), jnp.int32)
        t_k = jnp.zeros((P, 16, K), jnp.float32)
        t_m = jnp.zeros((P, 8, M), jnp.float32)
        ok &= check(f"onehot_cols [{label}]",
                    lambda i, t: onehot_cols_batch(i, t), idx, t_k)
        ok &= check(f"onehot_rows [{label}]",
                    lambda i, t: onehot_rows_batch(i, t), idx,
                    jnp.zeros((P, K, 16), jnp.float32))

        packed = jnp.zeros((P, 7, cap), jnp.float32)
        ok &= check(f"merge packed 2D [{label}]",
                    lambda pk, k=out_k: gm_merge_pallas_batch_packed(
                        pk, 5.0, k, sorted_w=True), packed)

        ints = jnp.zeros((P, 4, cap), jnp.int32)
        flts = jnp.zeros((P, 2, cap), jnp.float32)
        ok &= check(f"merge tables 2D [{label}]",
                    lambda i, f, a, b, k=out_k: gm_merge_pallas_batch_tables(
                        i, f, a, b, 5.0, k, sorted_w=True),
                    ints, flts, t_k, t_m)

    packed4 = jnp.zeros((P, 16, 512), jnp.float32)
    ok &= check("merge packed 4D",
                lambda pk: gm_merge_pallas_batch_packed_4d(pk, 5.0, 128,
                                                           sorted_w=True),
                packed4)

    print("ALL OK" if ok else "LOWERING FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
