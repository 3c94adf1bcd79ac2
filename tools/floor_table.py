"""Per-op floor table: measured device time vs padded-FLOP bound, per site.

Compiles the CFG UNet step once, dumps the optimized HLO (works through the
tunnel), profiles 4 iterations, then joins: for every fusion that contains a
convolution or custom-call matmul, parse the conv/dot operand shapes from
the HLO and compute the lane-padded MXU bound at 197 TFLOP/s bf16. The
output is the airtight floor argument the 4x target discussion needs
(VERDICT r3 #1 fallback): measured vs bound, per site, summed.

Usage:
  python tools/floor_table.py            # capture (chip) + join, prints table
  python tools/floor_table.py capture    # compile+profile only; saves
                                         #   /tmp/floor_hlo.txt, /tmp/floor_rows.json
  python tools/floor_table.py join       # re-join saved artifacts (no chip)
"""

import json
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


def _first_shape(line):
    m = _SHAPE.search(line)
    return [int(v) for v in m.group(2).split(",") if v] if m else None


def conv_bound_from_body(body: str, defs):
    """(padded-bound ms, class) of the convolutions inside one fusion body.

    Operands in this HLO dump are bare ``%name`` references (no inline
    types), so shapes resolve through ``defs`` (global name -> definition
    line). ``dim_labels`` drives the MACs: rows = prod(out dims != 'f'),
    K = prod(rhs dims != 'o') lane-padded, N = rhs 'o' dims lane-padded —
    valid for spatial convs (b01f_01io->b01f) and the plain matmuls XLA
    lowers to 1-D convs (0bf_io0->0bf). XLA also encodes batched attention
    einsums and head-split projections as convs with ``lhs_dilate`` /
    ``rhs_reversal`` / asymmetric pads — the MAC formula does NOT apply
    there (the striding discards most taps), so those rows are classed
    ``attn-matmul`` with no bound; PARITY's attention roofline covers them.
    """
    flops = 0.0
    klass = None
    for line in body.splitlines():
        cm = re.search(r"= \S+ convolution\(([^)]*)\)", line)
        if not cm:
            continue
        if re.search(r"lhs_dilate|rhs_reversal", line):
            return 0.0, "attn-matmul"
        dl = re.search(r"dim_labels=([\w]+)_([\w]+)->([\w]+)", line)
        out_s = _first_shape(line)
        args = [a.strip().lstrip("%") for a in cm.group(1).split(",")]
        if dl is None or out_s is None or len(args) < 2:
            continue
        rhs_s = _first_shape(defs.get(args[1], ""))
        if rhs_s is None:
            continue
        rhs_spec, out_spec = dl.group(2), dl.group(3)
        spatial = sum(ch.isdigit() for ch in rhs_spec if ch not in "io")
        mrows = math.prod(
            out_s[i] for i, ch in enumerate(out_spec) if ch != "f")
        k = math.prod(rhs_s[i] for i, ch in enumerate(rhs_spec) if ch != "o")
        n = math.prod(rhs_s[i] for i, ch in enumerate(rhs_spec) if ch == "o")
        flops += 2 * mrows * pad128(k) * pad128(n)
        kh = math.prod(rhs_s[i] for i, ch in enumerate(rhs_spec)
                       if ch.isdigit())
        klass = "conv" if kh > 1 else "matmul"
    return flops / TFLOPS * 1e3, klass  # ms


def short_name(line):
    m = re.search(r'op_name="jit\([\w]+\)/(?:UNetModel/)*(?:UNetModel\._apply_layer/)?(?:Decoder/)?([^"]+)"', line)
    if not m:
        return ""
    s = m.group(1)
    return re.sub(r"/(dot_general|conv_general_dilated|reduce_sum|add|convert_element_type)$", "", s)


HLO_PATH = "/tmp/floor_hlo.txt"
ROWS_PATH = "/tmp/floor_rows.json"
HLO_DEC_PATH = "/tmp/floor_hlo_dec.txt"
ROWS_DEC_PATH = "/tmp/floor_rows_dec.json"


def capture():
    """Compile the CFG UNet step, profile 4 iters, save HLO + op-rows."""
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
    # Params are JIT ARGUMENTS, not closed-over constants. Closed-over
    # zeros get inlined as constants and XLA's CSE then merges structurally
    # identical branches — in the r3 zero-param HLO dump the flash kernel's
    # q and v operands aliased the SAME instruction (to_v's projection was
    # deleted), understating the conv path. As runtime parameters the
    # values can't be assumed equal, matching how production runs (real
    # checkpoints are runtime params). Zeros are fine as the actual values.
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                            else s.dtype), shapes)["params"]

    @jax.jit
    def step(x, p, c):
        return unet.apply({"params": p}, x, t0, c).astype(jnp.bfloat16)

    lowered = step.lower(x0, params, c0)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # profile
    sync(step(x0, params, c0))
    logdir = tempfile.mkdtemp(prefix="floor_")
    x = x0
    jax.profiler.start_trace(logdir)
    for _ in range(4):
        x = step(x, params, c0)
    sync(x)
    jax.profiler.stop_trace()
    rows = parse_trace(logdir)

    with open(HLO_PATH, "w") as f:
        f.write(hlo)
    with open(ROWS_PATH, "w") as f:
        json.dump(rows, f)
    print(f"captured: {len(hlo)} HLO chars -> {HLO_PATH}, "
          f"{len(rows)} op rows -> {ROWS_PATH}", file=sys.stderr)
    return hlo, rows


def capture_decode():
    """Compile + profile the kl-f8 VAE decode leg at the bench operating
    point (batch 8, bf16, 64x64x4 -> 512x512x3). VERDICT r3 weak #1: this
    leg (~3 ms/step amortized of the 114 ms headline, fp32 until late r3)
    was never per-site profiled. Same join as the UNet step."""
    from sd_tpu.models.vae import Decoder

    bdec = B // 2  # bench batch (B is the CFG-doubled UNet batch)
    decoder = Decoder(ch=128, out_ch=3, ch_mult=[1, 2, 4, 4],
                      num_res_blocks=2, attn_resolutions=[], resolution=512,
                      z_channels=4, dtype=jnp.bfloat16)
    z0 = jnp.zeros((bdec, 64, 64, 4), jnp.bfloat16)
    shapes = jax.eval_shape(lambda k: decoder.init(k, z0),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16 if s.dtype == jnp.float32
                            else s.dtype), shapes)["params"]

    @jax.jit
    def dstep(z, p):
        img = decoder.apply({"params": p}, (z / 0.18215).astype(jnp.bfloat16))
        return jnp.clip((img.astype(jnp.float32) + 1) / 2, 0, 1)

    compiled = jax.jit(dstep).lower(z0, params).compile()
    hlo = compiled.as_text()

    sync(dstep(z0, params))
    logdir = tempfile.mkdtemp(prefix="floor_dec_")
    jax.profiler.start_trace(logdir)
    outs = [dstep(z0, params) for _ in range(4)]
    sync(outs[-1])
    jax.profiler.stop_trace()
    rows = parse_trace(logdir)

    with open(HLO_DEC_PATH, "w") as f:
        f.write(hlo)
    with open(ROWS_DEC_PATH, "w") as f:
        json.dump(rows, f)
    print(f"captured decode: {len(hlo)} HLO chars -> {HLO_DEC_PATH}, "
          f"{len(rows)} op rows -> {ROWS_DEC_PATH}", file=sys.stderr)
    return hlo, rows


def join(hlo, rows):
    # split into computations
    comps = {}
    for m in re.finditer(
            r"^(?:ENTRY )?%?([\w\.\-]+)(?: \([^)]*\))? .*?\{\n(.*?)^\}",
            hlo, re.M | re.S):
        comps[m.group(1)] = m.group(2)

    # global name -> definition line (works across computations; fusion
    # result types may be tuples, so never regex the type token)
    defs = {}
    for line in hlo.splitlines():
        ls = line.strip()
        if ls.startswith("%") and " = " in ls:
            defs[ls.split(" = ", 1)[0].lstrip("%")] = ls

    # fusion instr -> called computation; bare convolutions map to None
    fusion_calls = {}
    for name, line in defs.items():
        if re.search(r"\bfusion\(", line):
            m = re.search(r"calls=%?([\w\.\-]+)", line)
            if m:
                fusion_calls[name] = m.group(1)
        elif re.search(r"\bconvolution\(", line):
            fusion_calls.setdefault(name, None)

    out = []
    attn_ms = 0.0
    totals = defaultdict(lambda: [0.0, 0.0])  # class -> [ms, bound]
    for name, ms in rows.items():
        ms /= 4
        if name not in fusion_calls:
            continue
        called = fusion_calls[name]
        body = comps.get(called, "") if called else defs.get(name, "")
        bound, klass = conv_bound_from_body(body, defs)
        if klass == "attn-matmul":
            attn_ms += ms
            continue
        if bound <= 0:
            continue
        totals[klass][0] += ms
        totals[klass][1] += bound
        out.append((ms, bound, klass, name,
                    short_name(defs.get(name, ""))))

    out.sort(reverse=True)
    print(f"{'measured':>9s} {'bound':>7s} {'eff':>5s} {'class':>7s}  site")
    for ms, bound, klass, name, sname in out:
        print(f"{ms:9.3f} {bound:7.3f} {bound / ms * 100:4.0f}% {klass:>7s}"
              f"  {sname[:70] or name[:70]}")
    for klass, (ms, bound) in sorted(totals.items()):
        print(f"\n{klass} total: measured {ms:.2f} ms, padded bound "
              f"{bound:.2f} ms ({bound / max(ms, 1e-9) * 100:.0f}%)")
    print(f"attn-einsum-as-conv (XLA cross-attn path, bound n/a here — "
          f"see PARITY attention roofline): {attn_ms:.2f} ms")
    copies = [(ms / 4, n) for n, ms in rows.items()
              if "copy" in n and not n.startswith("jit_")]
    print(f"\nsync copies: {sum(ms for ms, _ in copies):.2f} ms total")
    for ms, n in sorted(copies, reverse=True)[:12]:
        print(f"{ms:9.3f}  {n[:90]}")
    print(f"whole step: see jit_step line in tools/trace_summary.py")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("capture", "all"):
        hlo, rows = capture()
    if mode == "join":
        hlo = open(HLO_PATH).read()
        rows = json.load(open(ROWS_PATH))
    if mode in ("join", "all"):
        join(hlo, rows)
    if mode in ("decode", "decode-capture"):
        hlo, rows = capture_decode()
    if mode == "decode-join":
        hlo = open(HLO_DEC_PATH).read()
        rows = json.load(open(ROWS_DEC_PATH))
    if mode in ("decode", "decode-join"):
        join(hlo, rows)


if __name__ == "__main__":
    main()
