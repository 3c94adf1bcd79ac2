"""Per-op floor table: measured device time vs padded-FLOP bound, per site.

Compiles the CFG UNet step once, dumps the optimized HLO (works through the
tunnel), profiles 4 iterations, then joins: for every fusion that contains a
convolution or custom-call matmul, parse the conv/dot operand shapes from
the HLO and compute the lane-padded MXU bound at 197 TFLOP/s bf16. The
output is the airtight floor argument the 4x target discussion needs
(VERDICT r3 #1 fallback): measured vs bound, per site, summed.

Usage: python tools/floor_table.py [> table.txt]
"""

import math
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 16
TFLOPS = 197e12


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def pad128(v):
    return 128 * math.ceil(v / 128)


def parse_trace(logdir):
    from jax.profiler import ProfileData

    path = None
    for root, _, files in os.walk(logdir):
        for f in files:
            if f.endswith(".xplane.pb"):
                path = os.path.join(root, f)
    data = ProfileData.from_serialized_xspace(open(path, "rb").read())
    rows = defaultdict(float)
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            if "Steps" in line.name:
                continue
            for ev in line.events:
                name = ev.name.split(" = ")[0].lstrip("%")
                rows[name] += (ev.end_ns - ev.start_ns) / 1e6
    return rows


_SHAPE = re.compile(r"(bf16|f32)\[([\d,]*)\]")


def conv_bound_from_hlo(body: str):
    """Padded-FLOP bound of the convolutions/dots inside one fusion body."""
    flops = 0.0
    for m in re.finditer(
            r"= \S+ (convolution|dot)\(([^)]*)\)[^\n]*", body):
        line = m.group(0)
        shapes = _SHAPE.findall(line)
        if len(shapes) < 3:
            continue
        out_s = [int(v) for v in shapes[0][1].split(",") if v]
        lhs_s = [int(v) for v in shapes[1][1].split(",") if v]
        rhs_s = [int(v) for v in shapes[2][1].split(",") if v]
        if m.group(1) == "convolution":
            dnums = re.search(r"dim_labels=(\S+)", line)
            # NHWC/HWIO assumed (repo convention); K = kh*kw*cin
            if len(rhs_s) == 4 and len(out_s) == 4:
                kh, kw, cin, cout = rhs_s
                mrows = out_s[0] * out_s[1] * out_s[2]
                flops += 2 * mrows * pad128(kh * kw * cin) * pad128(cout)
        else:  # dot: use trailing dims heuristic [.., M, K] x [.., K, N]
            mrows = lhs_s[-2]
            k = lhs_s[-1]
            n = rhs_s[-1]
            batch = max(1, math.prod(out_s[:-2]) if len(out_s) > 2 else 1)
            flops += 2 * batch * mrows * pad128(k) * pad128(n)
    return flops / TFLOPS * 1e3  # ms


def main():
    from sd_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.from_dict(dict(
        image_size=64, in_channels=4, out_channels=4, model_channels=320,
        attention_resolutions=[4, 2, 1], num_res_blocks=2,
        channel_mult=[1, 2, 4, 4], num_heads=8,
        use_spatial_transformer=True, transformer_depth=1,
        context_dim=768, legacy=False,
    ))
    unet = UNetModel(config=cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((B, 64, 64, 4), jnp.bfloat16)
    t0 = jnp.zeros((B,), jnp.float32)
    c0 = jnp.zeros((B, 77, 768), jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: unet.init(k, x0, t0, c0),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                            else s.dtype), shapes)["params"]

    @jax.jit
    def step(x):
        return unet.apply({"params": params}, x, t0, c0).astype(jnp.bfloat16)

    lowered = step.lower(x0)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # map each top-level instruction name -> its (inlined) fusion body
    bodies = {}
    cur = None
    for m in re.finditer(r"^%?(\S+?) \(.*?\) -> .*?{$|^\}", hlo, re.M):
        pass  # computations parsed below

    # split into computations
    comps = {}
    for m in re.finditer(
            r"^(?:ENTRY )?%?([\w\.\-]+)(?: \([^)]*\))? .*?\{\n(.*?)^\}",
            hlo, re.M | re.S):
        comps[m.group(1)] = m.group(2)

    # fusion instr -> called computation
    fusion_calls = {}
    for cname, body in comps.items():
        for m in re.finditer(
                r"%?([\w\.\-]+) = \S+ fusion\([^)]*\).*?calls=%?([\w\.\-]+)",
                body):
            fusion_calls[m.group(1)] = m.group(2)
        for m in re.finditer(
                r"%?([\w\.\-]+) = \S+ (convolution)\(", body):
            fusion_calls.setdefault(m.group(1), None)

    # profile
    sync(step(x0))
    logdir = tempfile.mkdtemp(prefix="floor_")
    x = x0
    jax.profiler.start_trace(logdir)
    for _ in range(4):
        x = step(x)
    sync(x)
    jax.profiler.stop_trace()
    rows = parse_trace(logdir)

    total_ms = total_bound = 0.0
    out = []
    for name, ms in rows.items():
        ms /= 4
        called = fusion_calls.get(name)
        if called is None and name not in fusion_calls:
            continue
        body = comps.get(called, "") if called else ""
        if not body:
            # bare convolution at top level: find its own line
            for cbody in comps.values():
                m = re.search(rf"%?{re.escape(name)} = [^\n]+", cbody)
                if m:
                    body = m.group(0)
                    break
        bound = conv_bound_from_hlo(body)
        if bound <= 0:
            continue
        total_ms += ms
        total_bound += bound
        out.append((ms, bound, name))

    out.sort(reverse=True)
    print(f"{'measured':>9s} {'bound':>7s} {'eff':>5s}  op")
    for ms, bound, name in out:
        print(f"{ms:9.3f} {bound:7.3f} {bound / ms * 100:4.0f}%  {name[:80]}")
    print(f"\nMXU-op total: measured {total_ms:.2f} ms, padded bound "
          f"{total_bound:.2f} ms ({total_bound / max(total_ms, 1e-9) * 100:.0f}%)")
    print(f"whole step: see jit_step line in tools/trace_summary.py")


if __name__ == "__main__":
    main()
