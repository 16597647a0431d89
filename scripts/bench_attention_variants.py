"""Micro-benchmarks for attention / LN / patch-embed variants on the real chip.

Each variant is timed with the iteration loop inside ONE jitted program
(fori_loop, dynamic bound) and synchronized by pulling a scalar to host —
the measurement discipline from PERFORMANCE.md.

Run one experiment group per clean process:
    python scripts/bench_attention_variants.py attn   [batch] [seq] [width] [heads]
    python scripts/bench_attention_variants.py patch  [batch]
    python scripts/bench_attention_variants.py ln     [batch]
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def timed(name, fn, *args, iters=32, warmup=3):
    """NB: pass every tensor (weights included) through *args — closing
    over arrays inside the jitted loop bakes them into the HLO as
    constants, which measures a different program than the shipped model
    path (CLAUDE.md: params are always jit arguments)."""

    @jax.jit
    def loop(n, *args):
        def body(i, carry):
            return fn(carry, *args)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(jnp.int32(warmup), *args))
    tic = time.perf_counter()
    float(loop(jnp.int32(iters), *args))
    dt = (time.perf_counter() - tic) / iters
    print(f"{name:<44} {dt * 1e6:10.1f} us/iter")
    return dt


def attn_variants(batch=128, seq=50, width=768, heads=12):
    head_dim = width // heads
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, seq, width)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    wqkv = jnp.asarray(
        (rng.normal(size=(width, 3 * width)) * 0.02).astype(np.float32)
    ).astype(jnp.bfloat16)
    wout = jnp.asarray(
        (rng.normal(size=(width, width)) * 0.02).astype(np.float32)
    ).astype(jnp.bfloat16)

    scale = head_dim**-0.5

    def qkv_proj(xx, wqkv):
        qkv = jnp.matmul(xx, wqkv, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        )
        return jnp.split(qkv, 3, axis=-1)

    def out_proj(o, wout):
        return jnp.matmul(o, wout, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        )

    def v_current(carry, x, wqkv, wout):
        """moveaxis heads, fp32 logits (the shipped unfolded path)."""
        xx = x + carry.astype(jnp.bfloat16) * 1e-12
        q, k, v = qkv_proj(xx, wqkv)

        def hsplit(t):
            t = t.reshape(batch, seq, heads, head_dim)
            return jnp.moveaxis(t, -2, -3)

        q, k, v = hsplit(q) * scale, hsplit(k), hsplit(v)
        logits = jnp.matmul(
            q, jnp.swapaxes(k, -1, -2), preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        o = jnp.matmul(attn, v, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        )
        o = jnp.moveaxis(o, -3, -2).reshape(batch, seq, width)
        return jnp.sum(out_proj(o, wout)).astype(jnp.float32)

    def v_einsum_f32(carry, x, wqkv, wout):
        """einsum bhlm layout (no explicit moveaxis), fp32 logits."""
        xx = x + carry.astype(jnp.bfloat16) * 1e-12
        q, k, v = qkv_proj(xx, wqkv)
        q = q.reshape(batch, seq, heads, head_dim) * scale
        k = k.reshape(batch, seq, heads, head_dim)
        v = v.reshape(batch, seq, heads, head_dim)
        logits = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(jnp.bfloat16)
        o = jnp.einsum(
            "bhlm,bmhd->blhd", attn, v, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        return jnp.sum(out_proj(o.reshape(batch, seq, width), wout)).astype(jnp.float32)

    def v_einsum_bf16(carry, x, wqkv, wout):
        """einsum layout + bf16 logits buffer (softmax still subtracts max)."""
        xx = x + carry.astype(jnp.bfloat16) * 1e-12
        q, k, v = qkv_proj(xx, wqkv)
        q = q.reshape(batch, seq, heads, head_dim) * scale
        k = k.reshape(batch, seq, heads, head_dim)
        v = v.reshape(batch, seq, heads, head_dim)
        logits = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            jnp.bfloat16
        )
        o = jnp.einsum(
            "bhlm,bmhd->blhd", attn, v, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        return jnp.sum(out_proj(o.reshape(batch, seq, width), wout)).astype(jnp.float32)

    def v_einsum_softmax_bf16(carry, x, wqkv, wout):
        """einsum layout, softmax computed fully in bf16 (max-sub in bf16)."""
        xx = x + carry.astype(jnp.bfloat16) * 1e-12
        q, k, v = qkv_proj(xx, wqkv)
        q = q.reshape(batch, seq, heads, head_dim) * scale
        k = k.reshape(batch, seq, heads, head_dim)
        v = v.reshape(batch, seq, heads, head_dim)
        logits = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        attn = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum(
            "bhlm,bmhd->blhd", attn, v, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        return jnp.sum(out_proj(o.reshape(batch, seq, width), wout)).astype(jnp.float32)

    def make_folded(f, bf16_logits):
        def v_folded(carry, x, wqkv, wout):
            xx = x + carry.astype(jnp.bfloat16) * 1e-12
            q, k, v = qkv_proj(xx, wqkv)

            def fold(t):
                return t.reshape(batch // f, f * seq, heads, head_dim)

            logits = jnp.einsum(
                "blhd,bmhd->bhlm", fold(q) * scale, fold(k),
                preferred_element_type=jnp.float32,
            )
            if bf16_logits:
                logits = logits.astype(jnp.bfloat16)
            idx = jnp.arange(f * seq) // seq
            same = idx[:, None] == idx[None, :]
            fmask = jnp.where(same, 0.0, -jnp.inf).astype(logits.dtype)
            attn = jax.nn.softmax(
                (logits + fmask).astype(jnp.float32), axis=-1
            ).astype(jnp.bfloat16)
            o = jnp.einsum(
                "bhlm,bmhd->blhd", attn, fold(v),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            return jnp.sum(out_proj(o.reshape(batch, seq, width), wout)).astype(
                jnp.float32
            )

        return v_folded

    def v_custom_softmax(carry, x, wqkv, wout):
        """bf16 logits + bf16 exp buffer, fp32 sum, divide AFTER the AV matmul
        (normalizer folded out of the [.., L, M] plane into [.., L, Dh])."""
        xx = x + carry.astype(jnp.bfloat16) * 1e-12
        q, k, v = qkv_proj(xx, wqkv)
        q = q.reshape(batch, seq, heads, head_dim) * scale
        k = k.reshape(batch, seq, heads, head_dim)
        v = v.reshape(batch, seq, heads, head_dim)
        logits = jnp.einsum(
            "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp((logits - m).astype(jnp.float32)).astype(jnp.bfloat16)
        s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        o = jnp.einsum(
            "bhlm,bmhd->blhd", e, v, preferred_element_type=jnp.float32
        )
        o = (o / jnp.moveaxis(s, 1, 2)).astype(jnp.bfloat16)
        return jnp.sum(out_proj(o.reshape(batch, seq, width), wout)).astype(jnp.float32)

    def make_folded_custom(f):
        def v_folded(carry, x, wqkv, wout):
            xx = x + carry.astype(jnp.bfloat16) * 1e-12
            q, k, v = qkv_proj(xx, wqkv)

            def fold(t):
                return t.reshape(batch // f, f * seq, heads, head_dim)

            logits = jnp.einsum(
                "blhd,bmhd->bhlm", fold(q) * scale, fold(k),
                preferred_element_type=jnp.float32,
            )
            idx = jnp.arange(f * seq) // seq
            same = idx[:, None] == idx[None, :]
            fmask = jnp.where(same, 0.0, -jnp.inf).astype(jnp.float32)
            logits = (logits + fmask).astype(jnp.bfloat16)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp((logits - m).astype(jnp.float32)).astype(jnp.bfloat16)
            s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            o = jnp.einsum(
                "bhlm,bmhd->blhd", e, fold(v),
                preferred_element_type=jnp.float32,
            )
            o = (o / jnp.moveaxis(s, 1, 2)).astype(jnp.bfloat16)
            return jnp.sum(out_proj(o.reshape(batch, seq, width), wout)).astype(
                jnp.float32
            )

        return v_folded

    timed("current (moveaxis, fp32 logits)", v_current, x, wqkv, wout)
    timed("einsum bhlm, fp32 logits", v_einsum_f32, x, wqkv, wout)
    timed("einsum bhlm, bf16 logits/fp32 softmax", v_einsum_bf16, x, wqkv, wout)
    timed("einsum bhlm, bf16 softmax", v_einsum_softmax_bf16, x, wqkv, wout)
    timed("einsum bhlm, custom softmax div-after-AV", v_custom_softmax, x, wqkv, wout)
    for f in (2, 4, 8):
        if batch % f == 0 and f * seq <= 192:
            timed(f"einsum fold={f}, fp32 logits", make_folded(f, False), x, wqkv, wout)
            timed(f"einsum fold={f}, bf16 logits", make_folded(f, True), x, wqkv, wout)
            timed(f"einsum fold={f}, custom softmax", make_folded_custom(f), x, wqkv, wout)


def patch_variants(batch=128):
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.normal(size=(batch, 3, 224, 224)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.normal(size=(768, 3, 32, 32)) * 0.02).astype(np.float32)
    ).astype(jnp.bfloat16)  # OIHW

    w_flat = w.reshape(768, -1).T  # [3*32*32, 768]
    w_hwio = jnp.transpose(w, (2, 3, 1, 0))  # HWIO

    def v_reshape_matmul(carry, img, w, w_flat, w_hwio):
        x = img + carry.astype(jnp.bfloat16) * 1e-12
        b, c, h, ww = x.shape
        x = x.reshape(b, c, 7, 32, 7, 32).transpose(0, 2, 4, 1, 3, 5)
        x = x.reshape(b, 49, c * 32 * 32)
        out = jnp.matmul(x, w_flat, preferred_element_type=jnp.float32)
        return jnp.sum(out).astype(jnp.float32)

    def v_conv_nchw(carry, img, w, w_flat, w_hwio):
        x = img + carry.astype(jnp.bfloat16) * 1e-12
        out = jax.lax.conv_general_dilated(
            x, w, (32, 32), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(out).astype(jnp.float32)

    def v_conv_nhwc(carry, img, w, w_flat, w_hwio):
        x = img + carry.astype(jnp.bfloat16) * 1e-12
        x = jnp.transpose(x, (0, 2, 3, 1))
        out = jax.lax.conv_general_dilated(
            x, w_hwio, (32, 32), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(out).astype(jnp.float32)

    def v_dot_general(carry, img, w, w_flat, w_hwio):
        """contract (c, ph, pw) directly without a materialized transpose."""
        x = img + carry.astype(jnp.bfloat16) * 1e-12
        x = x.reshape(batch, 3, 7, 32, 7, 32)
        w6 = w.reshape(768, 3, 32, 32)
        out = jax.lax.dot_general(
            x, w6,
            (((1, 3, 5), (1, 2, 3)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [b, 7, 7, 768]
        return jnp.sum(out).astype(jnp.float32)

    def v_nhwc_input(carry, img, w, w_flat, w_hwio):
        """if the host shipped NHWC: reshape+transpose from [b,h,w,c]."""
        x = img + carry.astype(jnp.bfloat16) * 1e-12
        x = jnp.transpose(x, (0, 2, 3, 1))  # simulate NHWC arrival (not timed separately)
        x = x.reshape(batch, 7, 32, 7, 32, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(batch, 49, 32 * 32 * 3)
        # weight arranged [ph, pw, c] -> flat
        w2 = jnp.transpose(w, (2, 3, 1, 0)).reshape(-1, 768)
        out = jnp.matmul(x, w2, preferred_element_type=jnp.float32)
        return jnp.sum(out).astype(jnp.float32)

    for name, fn in [
        ("reshape+transpose+matmul (current)", v_reshape_matmul),
        ("lax.conv NCHW", v_conv_nchw),
        ("lax.conv NHWC (incl. layout transpose)", v_conv_nhwc),
        ("dot_general multi-contract", v_dot_general),
        ("NHWC-style reshape (incl. transpose)", v_nhwc_input),
    ]:
        timed(name, fn, img, w, w_flat, w_hwio)


def ln_variants(batch=128, seq=50, width=768):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, seq, width)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    scale = jnp.ones((width,), jnp.float32)
    bias = jnp.zeros((width,), jnp.float32)

    def v_fp32(carry, x, scale, bias):
        xx = (x + carry.astype(jnp.bfloat16) * 1e-12).astype(jnp.float32)
        mean = jnp.mean(xx, axis=-1, keepdims=True)
        var = jnp.var(xx, axis=-1, keepdims=True)
        y = (xx - mean) * jax.lax.rsqrt(var + 1e-5)
        y = (y * scale + bias).astype(jnp.bfloat16)
        return jnp.sum(y).astype(jnp.float32)

    def v_bf16(carry, x, scale, bias):
        xx = x + carry.astype(jnp.bfloat16) * 1e-12
        mean = jnp.mean(xx, axis=-1, keepdims=True, dtype=jnp.float32)
        xc = xx.astype(jnp.float32) - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = (xc * jax.lax.rsqrt(var + 1e-5)).astype(jnp.bfloat16)
        y = y * scale.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
        return jnp.sum(y).astype(jnp.float32)

    timed("LN fp32 compute (current)", v_fp32, x, scale, bias)
    timed("LN bf16 out / fp32 stats", v_bf16, x, scale, bias)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "attn"
    args = [int(a) for a in sys.argv[2:]]
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    if which == "attn":
        attn_variants(*args)
    elif which == "patch":
        patch_variants(*args)
    elif which == "ln":
        ln_variants(*args)
