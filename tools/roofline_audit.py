"""Per-fusion roofline audit of the serving-shape inference step.

VERDICT r3 #2 asks for "a per-phase roofline audit (HBM bytes + FLOPs per
fusion from the compiled HLO)". This tool:

  1. AOT-compiles ``model.predict`` at the serving shape and parses the
     optimized HLO text (``compiled.as_text()`` — the axon tunnel compiles
     server-side, so ``--xla_dump_to`` writes nothing locally);
  2. per ENTRY instruction, computes HBM bytes (operand + output, from the
     printed shapes) and MXU FLOPs (convolution/dot ops found inside the
     fused computation, sized from their shapes);
  3. runs a profiler trace and joins measured device time per instruction;
  4. prints each instruction's roofline floor = max(bytes/BW, flops/peak)
     vs measured time, sorted by headroom (= measured - floor), plus the
     per-phase totals (phase = the metadata op_name's module prefix).

Peak numbers are TPU v5e: 197 TFLOP/s bf16, 819 GB/s HBM.

Usage: python tools/roofline_audit.py [BATCH] [--train]
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12
PEAK_BW = 819e9

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of one shape string like ``bf16[32,200,336,256]{...}``;
    tuples pass each component through this regex and sum."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dtype]
    return total


def _dims(shape_str):
    m = _SHAPE_RE.search(shape_str)
    return [int(d) for d in m.group(2).split(",") if d] if m else []


def conv_flops(line: str) -> float:
    """FLOPs of a convolution HLO line from its output/operand shapes and
    window. 2 * batch_spatial_out * Cin/groups * Cout * prod(window)."""
    out_shape = _dims(line.split(" = ")[1])
    opnds = re.findall(r"%[\w.\-]+", line.split("convolution(")[1])
    del opnds  # operand shapes resolved by caller; window parsed here
    mwin = re.search(r"window={size=([\dx]+)", line)
    win = 1
    if mwin:
        for d in mwin.group(1).split("x"):
            win *= int(d)
    mdnums = re.search(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)", line)
    # Resolve Cin from the kernel shape embedded in the operand list when
    # printed inline; fall back to output-feature heuristics.
    return out_shape, win, mdnums


class HloModule:
    def __init__(self, text: str):
        self.text = text
        # instruction name -> full line, for every line "  %name = shape op(...)"
        self.lines = {}
        for m in re.finditer(r"^\s*(?:ROOT )?%([\w.\-]+) = ([^\n]+)", text, re.M):
            self.lines[m.group(1)] = m.group(2)
        # computation name -> body text
        self.computations = {}
        for m in re.finditer(r"^%([\w.\-]+) \(([^)]*)\) -> [^{]+\{", text, re.M):
            start = m.end()
            # crude brace matching: computations are flat (no nested braces
            # except attribute lists which stay on one line)
            end = text.find("\n}", start)
            self.computations[m.group(1)] = text[start:end]
        entry = re.search(r"^ENTRY %([\w.\-]+)", text, re.M)
        self.entry_name = entry.group(1) if entry else None

    def instr_shape(self, name: str) -> str:
        line = self.lines.get(name, "")
        return line.split(" ", 1)[0] if line else ""

    def fusion_flops(self, line: str) -> float:
        """MXU flops inside a fusion/custom-call/standalone conv line."""
        total = 0.0
        mcalls = re.search(r"calls=%([\w.\-]+)", line)
        bodies = []
        if mcalls and mcalls.group(1) in self.computations:
            bodies.append(self.computations[mcalls.group(1)])
        elif " convolution(" in line or " dot(" in line:
            bodies.append(line)
        for body in bodies:
            for im in re.finditer(
                r"%[\w.\-]+ = (\S+) (convolution|dot)\(([^)]*)\)([^\n]*)", body
            ):
                out_s, kind, operands, attrs = im.groups()
                out = _dims(out_s)
                ops = re.findall(r"%([\w.\-]+)", operands)
                if kind == "convolution":
                    mwin = re.search(r"window={size=([\dx]+)", attrs)
                    win = 1
                    if mwin:
                        for d in mwin.group(1).split("x"):
                            win *= int(d)
                    # Cin from the rhs (kernel) operand: parameter shapes
                    # live in the computation signature; use dim_labels to
                    # find input-feature dim of the kernel shape if
                    # resolvable, else assume dense NHWC io layout where
                    # kernel = [kh,kw,cin,cout].
                    cin = None
                    if len(ops) >= 2:
                        kshape = self._param_or_instr_shape(body, ops[1])
                        kd = _dims(kshape) if kshape else []
                        if len(kd) == 4:
                            # kernel dims include the window dims; cin is
                            # the remaining dim that is not cout
                            mtl = re.search(r"dim_labels=\S*_(\w+)->", attrs)
                            if mtl:
                                klabels = mtl.group(1)  # e.g. 01io
                                if "i" in klabels:
                                    cin = kd[klabels.index("i")]
                        if cin is None and kd:
                            cin = kd[-2] if len(kd) >= 2 else kd[0]
                    if cin is None:
                        cin = 1
                    feat_count = re.search(r"feature_group_count=(\d+)", attrs)
                    n_out = 1
                    for d in out:
                        n_out *= d
                    total += 2.0 * n_out * win * cin
                    del feat_count  # cin already per-group in the kernel shape
                else:  # dot
                    lshape = self._param_or_instr_shape(body, ops[0])
                    ld = _dims(lshape) if lshape else []
                    mctr = re.search(r"lhs_contracting_dims={([\d,]+)}", attrs)
                    k = 1
                    if ld and mctr:
                        for ci in mctr.group(1).split(","):
                            k *= ld[int(ci)]
                    n_out = 1
                    for d in out:
                        n_out *= d
                    total += 2.0 * n_out * k
        return total

    def _param_or_instr_shape(self, body: str, name: str):
        m = re.search(rf"%{re.escape(name)} = (\S+)", body)
        if m:
            return m.group(1)
        m = re.search(rf"%{re.escape(name)}: (\S+)\)?", body)
        if m:
            return m.group(1)
        return self.instr_shape(name)

    def entry_costs(self):
        """{instr base name: (bytes, flops, phase)} for ENTRY instructions."""
        entry_start = self.text.find("ENTRY ")
        entry_text = self.text[entry_start:]
        out = {}
        # Shape may be a tuple "(bf16[...]{...}, ...)" whose layout suffixes
        # contain parens (T(8,128)(2,1)S(1)) — match the OP as the first
        # lowercase word directly followed by "(" (dtype tokens are never
        # followed by an open paren; layout T()/S() markers are uppercase).
        for m in re.finditer(
            r"^\s*(?:ROOT )?%([\w.\-]+) = (.+?) ([a-z][\w\-]*)\(([^\n]*)",
            entry_text, re.M,
        ):
            name, shape, op, rest = m.groups()
            if op in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast", "after-all"):
                continue
            line = self.lines.get(name, "")
            nbytes = shape_bytes(shape)
            for opnd in re.findall(r"%([\w.\-]+)", rest.split("metadata=")[0]):
                nbytes += shape_bytes(self.instr_shape(opnd))
            flops = self.fusion_flops(line)
            mmeta = re.search(r'op_name="([^"]*)"', line)
            phase = "other"
            if mmeta:
                op_name = mmeta.group(1)
                parts = op_name.split("/")
                # jit(predict_fn)/Module.method/submodule/...
                if len(parts) >= 2:
                    seg = parts[1].split(".")[-1]
                    sub = parts[2] if len(parts) > 2 else ""
                    phase = f"{seg}/{sub.split('_')[0] if sub else ''}"
            out[name] = (nbytes, flops, phase)
        return out


def build_and_trace(batch_size: int, train: bool = False):
    import tempfile
    import time

    import jax
    import jax.numpy as jnp

    from bench import bench_cfg
    from detectron2_tensorflow_tpu.models import build_model

    cache = os.path.expanduser("~/.cache/detectron2_tensorflow_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t0 = time.time()

    def tick(msg):
        print(f"[{time.time() - t0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    if train:
        from bench_train import make_train_batch, train_cfg
        from detectron2_tensorflow_tpu.engine import (
            build_train_step,
            create_train_state,
        )

        cfg = train_cfg(batch_size)
        model = build_model(cfg)
        batch = make_train_batch(cfg)
        tick("init train state...")
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), batch)
        step = build_train_step(cfg, model, state.params)
        tick("lowering + compiling step...")
        compiled = step.lower(state, batch).compile()
        hlo_text = compiled.as_text()
        with open("/tmp/roofline_train_opt.hlo", "w") as f:
            f.write(hlo_text)
        tick(f"HLO {len(hlo_text)/1e6:.1f} MB; warmup...")
        state, metrics = step(state, batch)
        float(jax.device_get(metrics["total_loss"]))
        tick("tracing 3 steps...")
        logdir = tempfile.mkdtemp(prefix="roofline_train_trace_")
        with jax.profiler.trace(logdir):
            for _ in range(3):
                state, metrics = step(state, batch)
            float(jax.device_get(metrics["total_loss"]))
        tick(f"trace -> {logdir}")
        return hlo_text, logdir

    cfg = bench_cfg()
    model = build_model(cfg)
    batch1 = {
        "image": jnp.full((1, 800, 1344, 3), 110.0, jnp.float32),
        "image_size": jnp.array([[800, 1333]], jnp.int32),
    }
    tick("init...")
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch1)
    batch = {
        "image": jnp.full((batch_size, 800, 1344, 3), 110.0, jnp.float32),
        "image_size": jnp.tile(
            jnp.array([[800, 1333]], jnp.int32), (batch_size, 1)
        ),
    }
    tick("compiling predict...")
    lowered = jax.jit(model.predict).lower(variables, batch)
    compiled = lowered.compile()
    tick("fetching optimized HLO text...")
    hlo_text = compiled.as_text()
    with open("/tmp/roofline_opt.hlo", "w") as f:
        f.write(hlo_text)
    tick(f"HLO {len(hlo_text)/1e6:.1f} MB -> /tmp/roofline_opt.hlo; warmup run...")

    fn = jax.jit(model.predict)
    out = fn(variables, batch)
    float(jax.device_get(out.scores.sum()))
    tick("tracing 3 iterations...")
    logdir = tempfile.mkdtemp(prefix="roofline_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = fn(variables, batch)
        float(jax.device_get(out.scores.sum()))
    tick(f"trace -> {logdir}")
    return hlo_text, logdir


def trace_durations(logdir: str):
    import glob
    import gzip
    import json

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {logdir}"
    tr = json.loads(gzip.decompress(open(paths[0], "rb").read()))
    events = tr["traceEvents"] if isinstance(tr, dict) else tr
    meta = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            meta[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in meta.items()
        if ("/device" in n or "TPU" in n or "XLA" in n.upper()) and "Host" not in n
    }
    by_name = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        by_name[e.get("name", "?")] += e.get("dur", 0) / 1e3  # us -> ms
    return by_name


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 32
    iters = 3

    hlo_path = os.environ.get("ROOFLINE_HLO", "")
    trace_dir = os.environ.get("ROOFLINE_TRACE", "")
    if hlo_path and trace_dir:
        hlo_text = open(hlo_path).read()
        logdir = trace_dir
    else:
        hlo_text, logdir = build_and_trace(batch, train="--train" in sys.argv)

    mod = HloModule(hlo_text)
    costs = mod.entry_costs()
    durs = trace_durations(logdir)

    rows = []
    matched_ms = 0.0
    for tname, ms in durs.items():
        ms = ms / iters / batch  # per image
        base = tname
        info = costs.get(base)
        if info is None:
            # trace names may drop the %-prefix or add suffixes
            info = costs.get(base.split(" ")[0])
        if info is None:
            rows.append((ms, None, None, "?", tname))
            continue
        nbytes, flops, phase = info
        bfloor = nbytes / batch / PEAK_BW * 1e3
        ffloor = flops / batch / PEAK_FLOPS * 1e3
        rows.append((ms, bfloor, ffloor, phase, tname))
        matched_ms += ms

    total = sum(r[0] for r in rows)
    floor_total = sum(max(r[1] or 0, r[2] or 0) for r in rows)
    print(
        f"device total {total:.3f} ms/img; roofline floor {floor_total:.3f} "
        f"ms/img; headroom {total - floor_total:.3f} ms/img "
        f"({100 * (1 - floor_total / max(total, 1e-9)):.1f}%)\n"
    )
    print(f"{'ms/img':>8} {'floor':>8} {'bound':>6} {'eff':>5}  phase / op")
    rows.sort(key=lambda r: -(r[0] - max(r[1] or 0, r[2] or 0)))
    nrows = int(os.environ.get("ROOFLINE_ROWS", "40"))
    for ms, bfloor, ffloor, phase, tname in rows[:nrows]:
        if bfloor is None:
            print(f"{ms:8.4f} {'?':>8} {'?':>6} {'?':>5}  {phase} {tname[:70]}")
            continue
        floor = max(bfloor, ffloor)
        bound = "flop" if ffloor >= bfloor else "hbm"
        eff = floor / ms if ms > 0 else 0.0
        print(f"{ms:8.4f} {floor:8.4f} {bound:>6} {eff:5.2f}  {phase} {tname[:70]}")

    print("\nPer-phase totals (ms/img, measured vs floor):")
    per_phase = defaultdict(lambda: [0.0, 0.0])
    for ms, bfloor, ffloor, phase, _ in rows:
        per_phase[phase][0] += ms
        per_phase[phase][1] += max(bfloor or 0, ffloor or 0)
    for phase, (ms, floor) in sorted(per_phase.items(), key=lambda kv: -kv[1][0]):
        print(f"  {ms:8.4f} vs {floor:8.4f}  {phase}")


if __name__ == "__main__":
    main()
