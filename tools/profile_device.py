"""Capture a jax.profiler device trace for the two hot programs and
report the top-op time split (VERDICT r3 #5: make PERF.md's MFU-ceiling
claim profile-backed, not cost-analysis-backed).

Programs:
  generator — the trident generator forward at 256 px (the inference hot
              path, ref networks.py:1190-1340 semantics);
  train     — the full Module2 GAN train step (G x2 + 5 Ds + frozen nets
              + TPS warps + both Adams), shipped 256 px ngf/ndf=64 config.

The perfetto trace (plugins/profile/*/**.trace.json.gz) is parsed
directly: events on TensorCore lanes are aggregated by op name over the
profiled steps and printed as a top-K table with percentages, plus the
total device-busy time per step. Falls back to all-lane aggregation when
the runtime labels lanes differently (e.g. host-side tunnels).

Usage: python tools/profile_device.py [generator|train|both]
       [--steps N] [--out DIR] [--md FILE]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_trace_events(log_dir: str) -> list[dict]:
    paths = glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fp:
        data = json.load(fp)
    return data.get("traceEvents", [])


def _aggregate(events: list[dict]):
    """Aggregate op events on the device 'XLA Ops' lane by HLO category
    and by source line, summing durations (us) and model FLOPs.

    Trace format: metadata events (ph=M) name the process/thread lanes;
    complete events (ph=X) carry ts/dur in microseconds; TPU op events
    additionally carry hlo_category / model_flops / source in args."""
    lanes = {}
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            lanes[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def lane(e):
        return lanes.get((e.get("pid"), e.get("tid")), "")

    xs = [e for e in events if e.get("ph") == "X" and "dur" in e]
    ops = [e for e in xs if lane(e) == "XLA Ops"]
    on_device = bool(ops)
    if not ops:  # host fallback: everything except module-level lanes
        ops = [e for e in xs if lane(e) != "XLA Modules"]
    by_cat = collections.Counter()
    by_src = collections.Counter()
    by_op = collections.Counter()
    cat_bytes = collections.Counter()
    op_meta = {}
    flops = 0.0
    total = 0.0
    bytes_total = 0.0
    for e in ops:
        args = e.get("args", {}) or {}
        cat = args.get("hlo_category", e["name"].split(".")[0])
        src = args.get("source", "")
        key = f"{cat} @ {src}" if src else cat
        by_cat[cat] += e["dur"]
        by_src[key] += e["dur"]
        by_op[e["name"]] += e["dur"]
        if e["name"] not in op_meta:
            op_meta[e["name"]] = (cat, src,
                                  str(args.get("long_name", ""))[:160])
        flops += float(args.get("model_flops", 0) or 0)
        # TPU op events may carry memory-traffic counters; sum whichever
        # is present so the roofline can be checked from the trace
        b = (args.get("bytes_accessed", 0) or args.get("bytes accessed", 0)
             or 0)
        cat_bytes[cat] += float(b)
        bytes_total += float(b)
        total += e["dur"]
    lanes_used = sorted({pnames.get(e.get("pid"), "") + "/" + lane(e)
                         for e in ops})
    return dict(by_cat=by_cat, by_src=by_src, by_op=by_op, op_meta=op_meta,
                flops=flops, total=total, lanes=lanes_used,
                on_device=on_device, bytes_total=bytes_total,
                cat_bytes=cat_bytes)


def _report(agg, steps, top=12):
    total = agg["total"]
    dev_note = ("yes" if agg["on_device"]
                else "NO (host fallback — schedule, not op costs)")
    per_step_ms = total / 1e3 / max(steps, 1)
    lines = [f"lanes: {', '.join(agg['lanes'][:4])}",
             f"device-lane events: {dev_note}",
             f"device busy: {per_step_ms:.2f} ms/step "
             f"({total / 1e3:.1f} ms / {steps} steps)"]
    if agg["flops"]:
        fl = agg["flops"] / max(steps, 1)
        lines.append(
            f"model FLOPs: {fl / 1e9:.2f} GFLOP/step -> "
            f"{fl / (per_step_ms / 1e3) / 1e12:.2f} TFLOP/s achieved "
            f"over device-busy time")
    if agg.get("bytes_total"):
        bt = agg["bytes_total"] / max(steps, 1)
        lines.append(
            f"trace memory traffic: {bt / 1e9:.2f} GB/step -> "
            f"{bt / (per_step_ms / 1e3) / 1e9:.1f} GB/s over "
            "device-busy time")
    lines += ["", "| HLO category | ms/step | % | GB/step |",
              "|---|---|---|---|"]
    for name, dur in agg["by_cat"].most_common(top):
        gb = agg.get("cat_bytes", {}).get(name, 0) / 1e9 / max(steps, 1)
        lines.append(f"| {name} | {dur / 1e3 / max(steps, 1):.3f} | "
                     f"{100 * dur / max(total, 1e-9):.1f} | {gb:.2f} |")
    lines += ["", "| category @ source | ms/step | % |", "|---|---|---|"]
    for name, dur in agg["by_src"].most_common(top):
        lines.append(f"| {name[:90]} | {dur / 1e3 / max(steps, 1):.3f} | "
                     f"{100 * dur / max(total, 1e-9):.1f} |")
    return "\n".join(lines)


def _report_category(agg, steps, category, top=25):
    """Drill into one HLO category: top individual ops with source and
    the trace's long_name (shape/layout detail when the runtime emits
    it). Used to chase the 'data formatting' bucket op by op."""
    meta = agg["op_meta"]
    rows = [(name, dur) for name, dur in agg["by_op"].most_common()
            if meta.get(name, ("",))[0] == category]
    total = agg["total"]
    lines = [f"top '{category}' ops "
             f"({100 * sum(d for _, d in rows) / max(total, 1e-9):.1f}% "
             f"of device busy):",
             "", "| op | ms/step | % | source | detail |",
             "|---|---|---|---|---|"]
    for name, dur in rows[:top]:
        cat, src, long_name = meta[name]
        lines.append(
            f"| {name} | {dur / 1e3 / max(steps, 1):.3f} | "
            f"{100 * dur / max(total, 1e-9):.1f} | {src[:60]} | "
            f"{long_name[:100]} |")
    return "\n".join(lines)


def profile_generator(steps: int, log_dir: str):
    import jax
    import jax.numpy as jnp

    from animateportrait_tpu.models.gan import TridentGeneratorFullIFW
    from animateportrait_tpu.utils.smoke import random_variables

    H = 256
    model = TridentGeneratorFullIFW(output_nc=1, ngf=64, n_blocks=9,
                                    div=3, disp=3)
    rng = np.random.default_rng(0)
    args = (jnp.asarray(rng.uniform(-1, 1, (1, H, H, 3)), jnp.float32),
            jnp.asarray(rng.uniform(-1, 1, (1, H, H, 1)), jnp.float32),
            jnp.asarray(rng.uniform(-1, 1, (1, H, H, 1)), jnp.float32),
            jnp.asarray(rng.uniform(-1, 1, (1, H, H, 2)), jnp.float32),
            jnp.asarray(rng.standard_normal((1, H, H, 2)), jnp.float32),
            jnp.ones((1, H, H, 1), jnp.float32))
    variables = random_variables(lambda: model.init(jax.random.key(0),
                                                    *args))
    fn = jax.jit(lambda v, *a: model.apply(v, *a))
    out = fn(variables, *args)
    jax.block_until_ready(out)
    jax.profiler.start_trace(log_dir)
    for _ in range(steps):
        out = fn(variables, *args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()


def profile_renderer(steps: int, log_dir: str):
    """Trace the renderer stage (flow + TPS + generator decode + matte
    blend + uint8) — the e2e headline's hot program. One traced call
    renders `steps` frame-batches (frame_batch=8, drawing style,
    random-init full-size nets exactly like bench_e2e)."""
    import jax
    import jax.numpy as jnp

    from animateportrait_tpu.models.flowunet import FlowUnet
    from animateportrait_tpu.models.gan import (ResnetStyle2Generator,
                                                TridentGeneratorFullIFW)
    from animateportrait_tpu.models.modnet import MODNet
    from animateportrait_tpu.pipeline.render import (Module2Renderer,
                                                     RendererVariables)
    from animateportrait_tpu.utils.smoke import random_variables

    k = jax.random.key(0)
    cs = 256
    gen_v = random_variables(
        lambda: TridentGeneratorFullIFW(output_nc=1, ngf=64, div=3,
                                        disp=3).init(
            k, jnp.zeros((1, cs, cs, 3)), jnp.zeros((1, cs, cs, 1)),
            jnp.zeros((1, cs, cs, 1)), jnp.zeros((1, cs, cs, 2)),
            jnp.zeros((1, cs, cs, 2)), jnp.zeros((1, cs, cs, 1))))
    flow_v = random_variables(
        lambda: FlowUnet().init(k, jnp.zeros((1, 224, 224, 136))))
    modnet_v = random_variables(
        lambda: MODNet().init(k, jnp.zeros((1, cs, cs, 3))))
    static_v = random_variables(lambda: ResnetStyle2Generator().init(
        k, jnp.zeros((1, 512, 512, 3)), jnp.zeros((1, 128, 128, 3))))
    fb = 8
    renderer = Module2Renderer(
        RendererVariables(generator=gen_v, flowunet=flow_v,
                          modnet=modnet_v, static_drawing=static_v),
        style="drawing", frame_batch=fb, output_uint8=True)
    rng = np.random.default_rng(0)
    photo = rng.uniform(-1, 1, (cs, cs, 3)).astype(np.float32)
    a68 = rng.uniform(60, 200, (68, 2)).astype(np.float32)

    def lm_seq(T, seed):
        r = np.random.default_rng(seed)
        return (a68[None] + r.normal(0, 2, (T, 68, 2))).astype(np.float32)

    renderer(photo, a68, lm_seq(fb, 1))  # compile every stage
    jax.profiler.start_trace(log_dir)
    renderer(photo, a68, lm_seq(fb * steps, 2))
    jax.profiler.stop_trace()


def profile_train(steps: int, log_dir: str):
    import jax

    from animateportrait_tpu.train.module2 import (
        Module2Config, build_train_step, init_frozen_random, init_state,
        make_example_batch)

    cfg = Module2Config(
        compute_dtype=("bfloat16" if os.environ.get("PROF_BF16")
                       else "float32"),
        batch_d_passes=bool(int(os.environ.get("PROF_BATCH_D", "0"))))
    rng = jax.random.key(0)
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    with jax.default_device(cpu):
        batch = make_example_batch(cfg, batch_size=int(
            os.environ.get("PROF_TRAIN_BATCH", "4")))
        state = init_state(cfg, rng, batch)
        frozen = init_frozen_random(rng, cfg.crop_size)
    dev = jax.devices()[0]
    put = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda x: jax.device_put(x, dev), t)
    state, batch, frozen = put(state), put(batch), put(frozen)
    step = jax.jit(build_train_step(cfg), donate_argnums=(0,))
    state, m = step(state, batch, frozen, jax.random.key(1))
    jax.block_until_ready(m)
    jax.profiler.start_trace(log_dir)
    for i in range(steps):
        state, m = step(state, batch, frozen, jax.random.key(i))
    jax.block_until_ready(m)
    jax.profiler.stop_trace()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="both",
                    choices=["generator", "train", "renderer", "both"])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--out", default="/tmp/jax_trace")
    ap.add_argument("--md", default="")
    ap.add_argument("--drill", default="",
                    help="HLO category to break down op-by-op "
                         "(e.g. 'data formatting')")
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse an existing trace under --out "
                         "without re-running the program")
    args = ap.parse_args(argv)

    sections = []
    for prog in (["generator", "train"] if args.what == "both"
                 else [args.what]):
        log_dir = os.path.join(args.out, prog)
        os.makedirs(log_dir, exist_ok=True)
        if not args.parse_only:
            print(f"[profile] tracing {prog} x{args.steps} ...",
                  flush=True)
            {"generator": profile_generator, "train": profile_train,
             "renderer": profile_renderer}[prog](args.steps, log_dir)
        agg = _aggregate(_load_trace_events(log_dir))
        body = _report(agg, args.steps)
        if args.drill:
            body += "\n\n" + _report_category(agg, args.steps, args.drill)
        print(f"== {prog} ==\n{body}\n", flush=True)
        sections.append(f"### {prog}\n\n{body}")
    if args.md:
        with open(args.md, "w") as fp:
            fp.write("\n\n".join(sections) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
