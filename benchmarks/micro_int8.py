"""Micro-gate for an int8-quantized ViT path: int8 vs bf16 matmul rate.

TPU v5e datasheets list an int8 MXU mode at 2x the bf16 rate (394 vs 197
TOP/s/chip). If that rate were reachable, W8A8-quantizing the fused ViT
block's per-token matmuls (qkv/proj/MLP, ~72% of the layer's FLOPs) could
cut the ViT stage — 61% of the online step — by roughly a third.

Measured result (2026-08-17, one v5e chip, this repo's toolchain): int8
matmuls run at EXACTLY the bf16 rate through both lowerings —

    XLA einsum   [64,912,384] @ [384,1536]: bf16 186.1, int8 185.2 T(FL)OP/s
    Pallas jnp.dot, per-image grid:         bf16  65.3, int8  65.1 T/s

i.e. neither XLA nor Mosaic engages the 2x int8 mode here; int8 operands
are fed to the MXU at the bf16 pipeline rate. A W8A8 fused block would
therefore add quantization work (per-token scales, rounding) and accuracy
risk for zero matmul speedup. Decision: not pursued; re-run this micro if
the toolchain is upgraded. See docs/KERNELS.md §4.

Shapes mirror the fused ViT-S block's MLP matmul at batch 64.
"""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from foundpose_tpu.utils.profiling import device_time_scan

    B, T, D, H = 64, 912, 384, 1536
    rng = np.random.default_rng(0)
    a_f = rng.standard_normal((B, T, D)).astype(np.float32)
    w_f = rng.standard_normal((D, H)).astype(np.float32)
    a_bf = jnp.asarray(a_f, jnp.bfloat16)
    w_bf = jnp.asarray(w_f, jnp.bfloat16)
    a_i8 = jnp.asarray(np.clip(np.round(a_f * 10), -127, 127).astype(np.int8))
    w_i8 = jnp.asarray(np.clip(np.round(w_f * 10), -127, 127).astype(np.int8))

    # `s` is a float seam: device_time_scan perturbs float inputs to defeat
    # CSE/hoisting, and the int8 case has no other float operand.
    def xla_mm(acc):
        def fn(a, w, s):
            r = jnp.einsum("btd,dh->bth", a, w, preferred_element_type=acc)
            return r.astype(jnp.float32) * s

        return fn

    def pallas_mm(acc, out_dt):
        def kern(a_ref, w_ref, o_ref):
            o_ref[...] = jnp.dot(a_ref[...], w_ref[...], preferred_element_type=acc)

        def fn(a, w, s):
            out = pl.pallas_call(
                kern,
                grid=(a.shape[0],),
                in_specs=[
                    pl.BlockSpec((1, T, D), lambda b: (b, 0, 0)),
                    pl.BlockSpec((D, H), lambda b: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, T, H), lambda b: (b, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((a.shape[0], T, H), out_dt),
            )(a, w)
            return out.astype(jnp.float32) * s

        return fn

    one = jnp.float32(1.0)
    flops = 2 * B * T * D * H
    cases = [
        ("xla-bf16", xla_mm(jnp.float32), (a_bf, w_bf)),
        ("xla-int8", xla_mm(jnp.int32), (a_i8, w_i8)),
        ("pallas-bf16", pallas_mm(jnp.float32, jnp.float32), (a_bf, w_bf)),
        ("pallas-int8", pallas_mm(jnp.int32, jnp.int32), (a_i8, w_i8)),
    ]
    for name, fn, args in cases:
        t = device_time_scan(fn, *args, one, iters=100)
        print(f"{name}: {t * 1e3:.3f} ms -> {flops / max(t, 1e-12) / 1e12:.1f} T/s")


if __name__ == "__main__":
    main()
