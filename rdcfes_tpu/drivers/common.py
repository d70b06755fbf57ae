"""Shared driver plumbing: output schedules, step banners, perf log,
optional XLA-level profiling."""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import List, Set


@contextmanager
def maybe_profile():
    """XLA-level trace when RDCFES_PROFILE=<dir> is set — the deeper
    companion to the PerfLog phase timers (SURVEY.md section 5: the
    reference's only tracing is libMesh's PerfLog; jax.profiler gives the
    per-kernel view).  View with TensorBoard or xprof."""
    trace_dir = os.environ.get("RDCFES_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {trace_dir}", file=sys.stderr)


def output_time_points(deck, n_steps: int, key: str = "output_time_points",
                       step_key: str = "output_step") -> Set[int]:
    """The reference's output-schedule logic (src/pihna.C:143-166): an
    explicit integer-list string when `output_step` is 0 (default: only the
    final step), else every multiple of `output_step`."""
    from ..io.getpot import export_integers

    step = deck(step_key, 0)
    if step == 0:
        return set(export_integers(deck(key, str(n_steps))))
    return set(range(step, n_steps + 1, step))


def step_banner(t: int, n: int, time_value: float, label: str = "Time") -> None:
    print(f" ==== Step {t:4d} out of {n:4d} ({label}={time_value:9g}) ==== ")


class PerfLog:
    """Phase timer printed at exit — the role of the reference's global
    libMesh PerfLog (src/main.C:7,59)."""

    def __init__(self, name: str = "rdcfes_tpu"):
        self.name = name
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def scope(self, label: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[label] += dt
            self.counts[label] += 1

    def report(self, out=None) -> None:
        if out is None:
            out = sys.stdout  # call-time stream, not import-time
        total = sum(self.totals.values())
        print(f"\n Performance log: {self.name}", file=out)
        print(f" {'phase':<28}{'calls':>8}{'total s':>12}{'avg ms':>12}", file=out)
        for label in sorted(self.totals, key=lambda k: -self.totals[k]):
            n = self.counts[label]
            tt = self.totals[label]
            print(f" {label:<28}{n:>8}{tt:>12.4f}{1e3 * tt / max(n, 1):>12.3f}",
                  file=out)
        print(f" {'TOTAL':<28}{'':>8}{total:>12.4f}", file=out)


def make_rdc_system(mesh, n_vars, physics, deck, *, clamp=None,
                    physics_blocks=None, **kwargs):
    """Build the transient system a driver steps: single-chip by default,
    or the halo-exchange multi-chip system when the deck asks for it.

    Deck key `parallel/n_devices` (capability upgrade: the reference runs
    every case under `mpiexec -n 4`, run/PIHNA/Makefile:6 — here the deck
    itself selects the device count).  Returns (system, get_u, put_state)
    where get_u(state) yields the global (N, V) solution in original node
    order and put_state(u0) builds the initial state."""
    import numpy as np

    n_dev = int(deck("parallel/n_devices", 0))
    # linear solver tolerance (deck knob `solver/linear/tolerance`).
    # Default 3e-11: the round-5 CALIBRATED value — 120-step trajectory
    # parity vs the direct-solve oracles measured worst per-step rel L2
    # 1.6e-9 at 3e-11 (6x inside the 1e-8 contract, BASELINE.json),
    # 7.0e-9 at 1e-10 (only 1.4x margin — rejected), 8e-11 at the
    # libMesh-default 1e-12.  Iteration savings ride refine_mixed's
    # adaptive per-pass ceiling (the final f32 sweep stops once the
    # projected residual meets tol).  The compiled-C++ baselines run
    # rtol 1e-10 (oracle/native_*.cpp) — looser than this default, so
    # the baseline comparison stays conservative.  Set 1e-12 to restore
    # the libMesh default (TOLERANCE^2, what the reference's unset
    # `linear solver tolerance` falls back to).
    rtol = float(deck("solver/linear/tolerance", 3e-11))
    kwargs.setdefault("rtol", rtol)
    if getattr(mesh, "elem_type", None) == "MIXED":
        # mixed-element meshes run through the per-type-block systems
        # (libMesh assembles them through one polymorphic loop; here each
        # type is its own static-shape batch — systems/mixed.py
        # single-chip, parallel/halo.py multi-chip)
        if n_dev <= 1:
            from ..systems import MixedTransientRDCSystem

            kw = {}
            if clamp is not None:
                kw["clamp"] = clamp
            if kwargs.get("moving_mesh"):
                kw["moving_mesh"] = True
            if kwargs.get("constraints") is not None:
                kw["constraints"] = kwargs["constraints"]
            kw["rtol"] = kwargs["rtol"]
            system = MixedTransientRDCSystem(mesh, n_vars, physics,
                                             precision="mixed", **kw)
            return (system, (lambda st: np.asarray(st["u"])),
                    system.initial_state)
        # fall through to the halo-exchange multi-chip path below
    if n_dev > 1:
        import jax
        from jax.sharding import Mesh as DeviceMesh

        from ..parallel import HaloShardedSystem

        devs = jax.devices()
        if len(devs) < n_dev:
            raise RuntimeError(
                f"parallel/n_devices = {n_dev} but only {len(devs)} "
                f"devices are visible"
            )
        dmesh = DeviceMesh(np.array(devs[:n_dev]), ("d",))
        kw = {}
        if clamp is not None:
            kw["clamp"] = clamp
        if physics_blocks is not None:
            kw["physics_blocks"] = physics_blocks
        if kwargs.get("moving_mesh"):
            kw["moving_mesh"] = True
        if kwargs.get("constraints") is not None:
            # hanging-node constraints ride the halo plan (the constraint
            # closure puts both masters in every shard that sees a
            # hanging node, so C / C^T stay communication-free)
            kw["constraints"] = kwargs["constraints"]
        kw["rtol"] = kwargs["rtol"]
        system = HaloShardedSystem(mesh, n_vars, physics, dmesh, **kw)
        return system, (lambda st: system.gather(st["u"])), system.initial_state
    from ..systems import TransientRDCSystem

    kw = dict(kwargs)
    if clamp is not None:
        kw["clamp"] = clamp
    if physics_blocks is not None:
        kw["physics_blocks"] = physics_blocks
    system = TransientRDCSystem(mesh, n_vars, physics, **kw)
    return system, (lambda st: np.asarray(st["u"])), system.initial_state


def make_solid_device_mesh(deck):
    """Device mesh for the solid path when the deck asks for one
    (`parallel/n_devices`): the constitutive assembly is element-sharded
    owner-computes (systems/solid.py)."""
    import numpy as np

    n_dev = int(deck("parallel/n_devices", 0))
    if n_dev <= 1:
        return None
    import jax
    from jax.sharding import Mesh as DeviceMesh

    devs = jax.devices()
    if len(devs) < n_dev:
        raise RuntimeError(
            f"parallel/n_devices = {n_dev} but only {len(devs)} "
            f"devices are visible"
        )
    return DeviceMesh(np.array(devs[:n_dev]), ("d",))
