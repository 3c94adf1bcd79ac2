"""Attention/UNet perf microbench for the axon TPU tunnel.

Timing methodology (CLAUDE.md / memory): async-dispatched chains with ONE
terminal ``float(jnp.sum(x))`` sync — ``block_until_ready`` lies through the
relay and every synchronous call pays a ~40-50 ms RPC floor.

Modes:
  python tools/bench_attn.py sites   # raw dot_product_attention at SD sites
  python tools/bench_attn.py unet    # full CFG UNet step + stub ablations

SD v1 @512px (f8 latents, 64x64) attention sites per CFG step (B = 2*images):
  self  N=4096  H=8 d=40  (C=320)   x5 layers
  self  N=1024  H=8 d=80  (C=640)   x5
  self  N=256   H=8 d=160 (C=1280)  x6
  cross N=4096 -> 77 ctx, d=40      x5
  cross N=1024 -> 77,      d=80     x5
  cross N=256  -> 77,      d=160    x6
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 16  # CFG-doubled batch for 8 images

SITES = [
    # (name, nq, nk, heads, dim_head, count_per_step)
    ("self4096_d40", 4096, 4096, 8, 40, 5),
    ("self1024_d80", 1024, 1024, 8, 80, 5),
    ("self256_d160", 256, 256, 8, 160, 6),
    ("cross4096_d40", 4096, 77, 8, 40, 5),
    ("cross1024_d80", 1024, 77, 8, 80, 5),
    ("cross256_d160", 256, 77, 8, 160, 6),
    # VAE mid-block attention (single head, d=512; decode runs at batch=8)
    ("vae4096_d512", 4096, 4096, 1, 512, 1),
]


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_chain(step, x0, iters=30, reps=2):
    x = step(x0)
    sync(x)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        x = x0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = step(x)
        sync(x)
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
    return best * 1000.0  # ms


def bench_sites(impls):
    from sd_tpu.ops.attention import dot_product_attention

    key = jax.random.PRNGKey(0)
    out = {}
    for name, nq, nk, h, d, cnt in SITES:
        kq, kk, kv = jax.random.split(key, 3)
        q0 = jax.random.normal(kq, (B, nq, h, d), jnp.bfloat16)
        k0 = jax.random.normal(kk, (B, nk, h, d), jnp.bfloat16)
        v0 = jax.random.normal(kv, (B, nk, h, d), jnp.bfloat16)
        for impl in impls:
            @jax.jit
            def step(q, _impl=impl, _k=k0, _v=v0):
                o = dot_product_attention(q, _k, _v, impl=_impl)
                return o  # same shape as q -> chains

            try:
                ms = time_chain(step, q0)
            except Exception as e:  # unsupported combos
                print(f"{name} {impl}: FAIL {type(e).__name__}: {e}", flush=True)
                continue
            out[f"{name}/{impl}"] = round(ms, 3)
            print(f"{name:16s} {impl:8s} {ms:8.3f} ms  (x{cnt} = "
                  f"{ms * cnt:6.2f} ms/step)", flush=True)
    print(json.dumps(out))


def random_leaves(shapes, seed=7):
    """Random bf16 params — NOT zeros: all-zero constants let XLA CSE
    structurally identical branches (to_q/to_k/to_v merge into one conv),
    deleting real work from whatever is being timed."""
    leaves, treedef = jax.tree.flatten(shapes)
    key = jax.random.PRNGKey(seed)
    return jax.tree.unflatten(treedef, [
        0.02 * jax.random.normal(
            jax.random.fold_in(key, i), s.shape,
            jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype)
        for i, s in enumerate(leaves)])


def build_unet():
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=True,
        transformer_depth=1, context_dim=768, legacy=False,
    ))
    unet = UNetModel(config=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.zeros((B,), jnp.float32)
    c0 = 0.02 * jax.random.normal(jax.random.PRNGKey(8), (B, 77, 768),
                                  jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(k, x0, t0, c0), jax.random.PRNGKey(0))
    params = random_leaves(shapes)["params"]
    return unet, params, x0, t0, c0


def bench_unet_noattn():
    """Conv-floor probe: the SAME UNet with attention_resolutions=[] (no
    SpatialTransformers at all) — isolates the resblock/updown conv path
    from the transformer projections/FF that the attention stubs keep."""
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8, use_spatial_transformer=False,
        legacy=False,
    ))
    unet = UNetModel(config=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.zeros((B,), jnp.float32)
    shapes = jax.eval_shape(lambda k: unet.init(k, x0, t0), jax.random.PRNGKey(0))
    params = random_leaves(shapes)["params"]

    @jax.jit
    def jstep(x, p):
        return unet.apply({"params": p}, x, t0).astype(jnp.bfloat16)

    ms = time_chain(lambda x: jstep(x, params), x0, iters=15, reps=2)
    print(f"unet/noattn  {ms:8.2f} ms per CFG step (pure conv/resblock path)")
    print(json.dumps({"noattn": round(ms, 2)}))


def bench_unet(variants):
    import sd_tpu.ops.attention as attn_mod

    real = attn_mod.dot_product_attention
    unet, params, x0, t0, c0 = build_unet()

    def make_patched(kind):
        def patched(q, k, v, scale=None, mask=None, impl="auto"):
            is_self = q.shape[1] == k.shape[1]
            if kind == "stub_all":
                return q
            if kind == "stub_self" and is_self:
                return q
            if kind == "stub_cross" and not is_self:
                return q
            if kind == "xla_all":
                return real(q, k, v, scale=scale, mask=mask, impl="xla")
            if kind == "mix":  # flash everywhere except self-4096
                if is_self and q.shape[1] >= 2048:
                    return real(q, k, v, scale=scale, mask=mask, impl="xla")
                return real(q, k, v, scale=scale, mask=mask, impl="flash")
            if kind == "mix2":  # flash ONLY at self-1024/256 (cross = XLA)
                if is_self and q.shape[1] <= 1024:
                    return real(q, k, v, scale=scale, mask=mask, impl="flash")
                return real(q, k, v, scale=scale, mask=mask, impl="xla")
            if kind == "mix3":  # mix2 + flash at the N=256 cross site
                if (is_self and q.shape[1] <= 1024) or (
                        not is_self and q.shape[1] <= 256):
                    return real(q, k, v, scale=scale, mask=mask, impl="flash")
                return real(q, k, v, scale=scale, mask=mask, impl="xla")
            if kind == "flash_all":
                return real(q, k, v, scale=scale, mask=mask, impl="flash")
            if kind == "crossflash":  # flash at the big cross sites only
                if not is_self and q.shape[1] >= 2048:
                    return real(q, k, v, scale=scale, mask=mask, impl="flash")
                return real(q, k, v, scale=scale, mask=mask, impl="auto")
            if kind == "crossflash_all":  # flash at every cross site >= 256
                if not is_self and q.shape[1] >= 256:
                    return real(q, k, v, scale=scale, mask=mask, impl="flash")
                return real(q, k, v, scale=scale, mask=mask, impl="auto")
            return real(q, k, v, scale=scale, mask=mask, impl=impl)
        return patched

    from sd_tpu.ops import norms as norms_mod

    real_gn_call = norms_mod.GroupNorm32.__call__
    real_ln_call = norms_mod.LayerNormFp32.__call__
    real_ff_call = attn_mod.FeedForward.__call__

    LOWER_FLAGS = {  # attention-lowering env experiments (trace-time reads)
        "projbar": ("SD_TPU_PROJ_BARRIER",),
        "crossbmm": ("SD_TPU_CROSS_BMM",),
        "lowerboth": ("SD_TPU_PROJ_BARRIER", "SD_TPU_CROSS_BMM"),
    }
    ENV_VALUE_FLAGS = {  # W8A8 bucket dispatch (ops/quant.py), r4 #6 / r5 #1
        "int8all": {"SD_TPU_INT8": "conv"},  # every Conv3x3 site (r4 name)
        "int8l0": {"SD_TPU_INT8": "4096"},   # 64x64 sites only
        "int8l01": {"SD_TPU_INT8": "1024"},  # 64x64 + 32x32 sites
        # r5 buckets (in-kernel W8A8)
        "int8ff": {"SD_TPU_INT8": "ff"},
        "int8attn": {"SD_TPU_INT8": "attn"},
        "int8attnpv": {"SD_TPU_INT8": "attn_pv"},
        "int8convff": {"SD_TPU_INT8": "conv,ff"},
        "int8full": {"SD_TPU_INT8": "conv,ff,attn"},
        "int8fullpv": {"SD_TPU_INT8": "conv,ff,attn,attn_pv"},
        "int8proj": {"SD_TPU_INT8": "proj"},
        "int8fullproj": {"SD_TPU_INT8": "conv,ff,attn,proj"},
    }

    results = {}
    for kind in variants:
        attn_kind = kind
        if kind in LOWER_FLAGS:
            for f in LOWER_FLAGS[kind]:
                os.environ[f] = "1"
            attn_kind = "auto"
        elif kind in ENV_VALUE_FLAGS:
            os.environ.update(ENV_VALUE_FLAGS[kind])
            attn_kind = "auto"
        elif kind == "bf16norm":  # fp32-norm-island cost probe (attn = auto)
            norms_mod.set_norm_stats_dtype(jnp.bfloat16)
            attn_kind = "auto"
        elif kind == "nonorm":  # GN/LN -> identity: total norm-pass cost
            norms_mod.GroupNorm32.__call__ = lambda self, x: x
            norms_mod.LayerNormFp32.__call__ = lambda self, x: x
            attn_kind = "auto"
        elif kind == "noff":  # FeedForward -> identity (GEGLU matmul cost)
            attn_mod.FeedForward.__call__ = (
                lambda self, x, deterministic=True: x)
            attn_kind = "auto"
        attn_mod.dot_product_attention = make_patched(attn_kind)

        @jax.jit
        def jstep(x, p, c):
            # params/context are jit ARGS (not closures): closed-over
            # constants get inlined and CSE'd (q/k/v merge), and large
            # random closures blow up the remote-compile payload.
            e = unet.apply({"params": p}, x, t0, c)
            return e.astype(jnp.bfloat16)

        try:
            ms = time_chain(lambda x: jstep(x, params, c0), x0,
                            iters=15, reps=2)
        except Exception as e:
            print(f"unet/{kind}: FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        finally:
            attn_mod.dot_product_attention = real
            for f in ("SD_TPU_PROJ_BARRIER", "SD_TPU_CROSS_BMM",
                      "SD_TPU_INT8"):
                os.environ.pop(f, None)
            norms_mod.set_norm_stats_dtype(jnp.float32)
            norms_mod.GroupNorm32.__call__ = real_gn_call
            norms_mod.LayerNormFp32.__call__ = real_ln_call
            attn_mod.FeedForward.__call__ = real_ff_call
        results[kind] = round(ms, 2)
        print(f"unet/{kind:12s} {ms:8.2f} ms per CFG step", flush=True)
    print(json.dumps(results))


FF_SITES = [
    # (name, rows, C, inner, count_per_step)
    ("ff4096_c320", B * 4096, 320, 1280, 5),
    ("ff1024_c640", B * 1024, 640, 2560, 5),
    ("ff256_c1280", B * 256, 1280, 5120, 6),
]


def bench_ff():
    """Fused GEGLU-FF kernel vs the plain-XLA path at the SD FF sites."""
    from sd_tpu.ops.pallas.geglu_ff import _ff_reference, geglu_ff

    key = jax.random.PRNGKey(0)
    out = {}
    for name, m, c, inner, cnt in FF_SITES:
        kx, kw = jax.random.split(jax.random.fold_in(key, m))
        x0 = jax.random.normal(kx, (m, c), jnp.bfloat16) * 0.5
        k1, k2, k3, k4 = jax.random.split(kw, 4)
        w1 = jax.random.normal(k1, (c, 2 * inner), jnp.bfloat16) * 0.03
        b1 = jax.random.normal(k2, (2 * inner,), jnp.float32) * 0.1
        w2 = jax.random.normal(k3, (inner, c), jnp.bfloat16) * 0.03
        b2 = jax.random.normal(k4, (c,), jnp.float32) * 0.1

        variants = {"xla": (None, False)}
        for bm in (256, 512, 1024):
            if m % bm == 0:
                variants[f"bm{bm}"] = (bm, False)
                variants[f"i8bm{bm}"] = (bm, True)
        for tag, (bm, i8) in variants.items():
            if bm is None:
                @jax.jit
                def step(x, _w1=w1, _b1=b1.reshape(1, -1), _w2=w2,
                         _b2=b2.reshape(1, -1)):
                    return _ff_reference(x, _w1, _b1, _w2, _b2)
            else:
                @jax.jit
                def step(x, _w1=w1, _b1=b1, _w2=w2, _b2=b2, _bm=bm, _i8=i8):
                    return geglu_ff(x, _w1, _b1, _w2, _b2, block_m=_bm,
                                    int8=_i8)

            try:
                ms = time_chain(step, x0)
            except Exception as e:
                print(f"{name}/{tag}: FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
                continue
            out[f"{name}/{tag}"] = round(ms, 3)
            print(f"{name:14s} {tag:6s} {ms:8.3f} ms  (x{cnt} = "
                  f"{ms * cnt:6.2f} ms/step)", flush=True)
    print(json.dumps(out))


def bench_int8_attn():
    """W8A8 flash kernel vs bf16 at the self-attention sites (r5 #1b), with
    a correctness sanity (rel error vs the bf16 kernel) per site."""
    from sd_tpu.ops.pallas.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    out = {}
    for name, nq, nk, h, d, cnt in SITES:
        if nq != nk or nq < 1024:
            continue
        kq, kk, kv = jax.random.split(jax.random.fold_in(key, nq), 3)
        q0 = jax.random.normal(kq, (B, nq, h, d), jnp.bfloat16)
        k0 = jax.random.normal(kk, (B, nk, h, d), jnp.bfloat16)
        v0 = jax.random.normal(kv, (B, nk, h, d), jnp.bfloat16)
        ref = None
        for mode in ("off", "qk", "qkpv"):
            @jax.jit
            def step(q, _k=k0, _v=v0, _m=mode):
                return flash_attention(q, _k, _v, int8=_m)

            try:
                o = step(q0)
                if mode == "off":
                    ref = jnp.asarray(o, jnp.float32)
                    rel = 0.0
                else:
                    rel = float(jnp.linalg.norm(jnp.asarray(o, jnp.float32)
                                                - ref)
                                / jnp.linalg.norm(ref))
                ms = time_chain(step, q0)
            except Exception as e:
                print(f"{name}/{mode}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            out[f"{name}/{mode}"] = {"ms": round(ms, 3), "rel": round(rel, 5)}
            print(f"{name:16s} int8={mode:5s} {ms:8.3f} ms (x{cnt} = "
                  f"{ms * cnt:6.2f} ms/step)  rel={rel:.2e}", flush=True)
    print(json.dumps(out))


def bench_sweep():
    """Kernel-variant sweep at the SD sites: block_q x exp_bf16 x kt_layout."""
    from sd_tpu.ops.pallas.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    # (block_q, exp_bf16, kt_layout, kv_chunk)
    combos = {
        "self4096_d40": [
            (1024, 0, 1, 1024),  # r2 incumbent: 7.52 ms
            (2048, 0, 1, 512), (2048, 0, 1, 1024), (2048, 0, 1, 2048),
            (4096, 0, 1, 1024), (4096, 0, 1, 2048), (1024, 0, 1, 2048),
        ],
        "self1024_d80": [(1024, 0, 1, 512), (1024, 0, 1, 256)],
        "self256_d160": [(256, 0, 1, None)],
    }
    out = {}
    for name, nq, nk, h, d, cnt in SITES:
        kq, kk, kv = jax.random.split(key, 3)
        q0 = jax.random.normal(kq, (B, nq, h, d), jnp.bfloat16)
        k0 = jax.random.normal(kk, (B, nk, h, d), jnp.bfloat16)
        v0 = jax.random.normal(kv, (B, nk, h, d), jnp.bfloat16)
        for bq, expb, ktl, ck in combos.get(name, []):
            @jax.jit
            def step(q, _k=k0, _v=v0, _bq=bq, _e=bool(expb), _t=bool(ktl),
                     _c=ck):
                return flash_attention(q, _k, _v, block_q=_bq, exp_bf16=_e,
                                       kt_layout=_t, kv_chunk=_c)

            tag = f"{name}/bq{bq}_exp{expb}_kt{ktl}_ck{ck}"
            try:
                ms = time_chain(step, q0)
            except Exception as e:
                print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            out[tag] = round(ms, 3)
            print(f"{tag:40s} {ms:8.3f} ms (x{cnt} = {ms * cnt:6.2f})", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sites"
    print(f"device: {jax.devices()[0]}", flush=True)
    if mode == "sites":
        impls = sys.argv[2].split(",") if len(sys.argv) > 2 else ["xla", "auto"]
        bench_sites(impls)
    elif mode == "sweep":
        bench_sweep()
    elif mode == "ff":
        bench_ff()
    elif mode == "int8attn":
        bench_int8_attn()
    elif mode == "noattn":
        bench_unet_noattn()
    elif mode == "unet":
        variants = (sys.argv[2].split(",") if len(sys.argv) > 2 else
                    ["auto", "xla_all", "stub_all", "stub_self", "stub_cross"])
        bench_unet(variants)
