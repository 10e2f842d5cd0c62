"""Tracing, timing, and roofline accounting.

The reference has no in-library profiling — only wall-clock totals
(reference: src/physher.c:320-324) and the benchmark harness's
clock_gettime loops (examples/benchmarking.c:17-20). This module is the
green-field TPU observability layer SURVEY.md §5 calls for: jax.profiler
trace capture, steady-state op timing with compile-time separation, and a
roofline model for the pruning kernel against the chip's peak FLOPs/HBM
bandwidth.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/physher_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class Timing:
    compile_s: float
    per_call_s: float
    calls: int

    @property
    def per_call_ms(self) -> float:
        return self.per_call_s * 1e3


def time_jit(fn, *args, calls: int = 20, warmup: int = 2) -> Timing:
    """Steady-state timing of a jitted callable: first call (compile)
    separated from the amortized per-call time."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(calls):
        out = fn(*args)
    jax.block_until_ready(out)
    return Timing(compile_s, (time.perf_counter() - t0) / calls, calls)


def trace_op_times(fn, args_seq, *, log_dir: str = "/tmp/physher_tpu_trace",
                   top: int = 20):
    """MEASURED device-op timing: run ``fn`` over ``args_seq`` (a sequence
    of argument tuples — perturb inputs between calls so nothing is served
    from an execution cache) under a jax.profiler trace, then parse the
    trace-event JSON and aggregate per-op durations on the device's
    "XLA Ops" track.

    Returns ``(total_device_s, [(op_name, seconds, count), ...])`` with the
    list sorted by time, truncated to ``top``. Total is device-busy time
    across ALL calls — divide by ``len(args_seq)`` for per-call.
    """
    import collections
    import glob
    import gzip
    import json
    import os
    import shutil

    import jax

    shutil.rmtree(log_dir, ignore_errors=True)
    out = fn(*args_seq[0])
    jax.block_until_ready(out)           # compile outside the trace
    jax.profiler.start_trace(log_dir)
    try:
        for args in args_seq:
            out = fn(*args)
        jax.block_until_ready(out)
    finally:
        jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(
        log_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        return 0.0, []
    with gzip.open(max(paths, key=os.path.getmtime)) as f:
        data = json.load(f)
    evs = data.get("traceEvents", [])
    dev_pids = {e["pid"] for e in evs
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in evs
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in dev_pids
               and e["args"].get("name") == "XLA Ops"}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in evs:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    total = sum(agg.values()) / 1e6
    rows = [(name, us / 1e6, cnt[name]) for name, us in agg.most_common(top)]
    return total, rows


# -- roofline ---------------------------------------------------------------

# peak dense f32-equivalent FLOPs and HBM bandwidth per chip generation
CHIP_PEAKS = {
    # name: (peak_tflops_bf16, hbm_gb_s)
    "v4": (275.0, 1228.0),
    "v5e": (394.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v6e": (918.0, 1640.0),
    "cpu": (0.5, 50.0),
}


@dataclass
class Roofline:
    flops: float
    bytes: float
    seconds: float
    chip: str = "v5e"
    notes: dict = field(default_factory=dict)

    @property
    def intensity(self) -> float:
        """Arithmetic intensity, FLOPs/byte."""
        return self.flops / max(self.bytes, 1.0)

    @property
    def achieved_tflops(self) -> float:
        return self.flops / max(self.seconds, 1e-12) / 1e12

    @property
    def achieved_gbs(self) -> float:
        return self.bytes / max(self.seconds, 1e-12) / 1e9

    def bound(self) -> str:
        peak_tf, peak_bw = CHIP_PEAKS.get(self.chip, CHIP_PEAKS["v5e"])
        ridge = peak_tf * 1e12 / (peak_bw * 1e9)
        return "compute" if self.intensity > ridge else "memory"

    def fraction_of_peak(self) -> float:
        peak_tf, peak_bw = CHIP_PEAKS.get(self.chip, CHIP_PEAKS["v5e"])
        if self.bound() == "compute":
            return self.achieved_tflops / peak_tf
        return self.achieved_gbs / peak_bw

    def report(self) -> str:
        frac = self.fraction_of_peak()
        # with both roofs far away the limiting-roof label misleads:
        # the kernel is really bound by per-op latency / pipeline
        # occupancy, not the roof it happens to sit under
        bound = (self.bound() if frac >= 0.3
                 else f"{self.bound()}-roof, latency/occupancy")
        return (f"{self.flops/1e9:.2f} GFLOP, {self.bytes/1e6:.1f} MB, "
                f"{self.seconds*1e3:.3f} ms -> "
                f"{self.achieved_tflops:.2f} TFLOP/s, "
                f"{self.achieved_gbs:.1f} GB/s "
                f"({bound}-bound, "
                f"{100*frac:.1f}% of peak on "
                f"{self.chip})")


def pruning_roofline(n_nodes: int, n_cat: int, n_states: int,
                     n_patterns: int, seconds: float, *,
                     dtype_bytes: int = 4, chip: str = "v5e",
                     with_gradient: bool = False) -> Roofline:
    """Roofline model of one likelihood evaluation.

    FLOPs: per internal node, per category: S x S x P multiply-adds per
    child (x2 children) plus the S x P product — the arithmetic the
    reference's SIMD kernels perform (treelikelihood4.c update_partials).
    Bytes: partials read/write + P-matrices, the HBM-bound floor for the
    level-batched XLA path (the fused Pallas kernel keeps partials in VMEM
    so its floor is tips + pmats + site_log only).
    """
    internal = n_nodes // 2
    flops = internal * n_cat * (2 * 2 * n_states * n_states * n_patterns
                                + n_states * n_patterns)
    byts = (n_nodes * n_cat * n_states * n_patterns * 2      # partials rw
            + n_nodes * n_cat * n_states * n_states) * dtype_bytes
    if with_gradient:
        flops *= 3
        byts *= 2
    return Roofline(float(flops), float(byts), seconds, chip)


def detect_chip() -> str:
    import jax

    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return "cpu"
    for key in ("v6e", "v5p", "v5e", "v5 lite", "v4"):
        if key in kind:
            return "v5e" if key == "v5 lite" else key
    return "cpu" if "cpu" in kind else "v5e"
