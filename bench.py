"""Benchmark driver: one JSON line with the headline metric.

Headline workload (BASELINE.md north star): the humanoidrun MBD denoise —
Nsample × Hsample × n_frames physics substeps per diffusion step on the
VMEM-resident Pallas engine — measured as env-steps/sec/chip inside the
denoise loop. vs_baseline = (10 s target / measured full-denoise wall time)
at the north-star config (Ndiffuse=300, Nsample=1024, horizon 50); >1 beats
the driver-set target.

The single JSON line also carries:
  * flagship: the same denoise at the reference's recommended humanoidrun
    Nsample=8192 (mbd_planner.py:54-60) — the actual production workload;
  * headline/flagship are measured on the default "stacked" precompute
    (minutes-class cold compile — always publishable), then the
    "unrolled" variant (sim/batched.py::precompute_variant — ~37% faster
    at runtime, hour-class cold compile) is attempted; if it completes
    and wins, it becomes the headline with the stacked numbers attached.
    A stall in any section past the watchdog publishes the best result
    measured so far rather than an error;
  * flop_model: XLA cost-analysis FLOPs of ONE batched physics substep
    (loop bodies are counted explicitly — cost-analyzing a scanned program
    reports its body once and undercounts ~H·n_frames×), scaled by the
    statically-known substep count, as algorithmic TFLOP/s against both
    the VPU f32 peak (this workload is elementwise/VPU-bound — no matmuls)
    and the chip's bf16 MXU peak (the conventional MFU denominator). The
    count is the sparsity-unrolled HLO of the XLA engine substep — close
    to executed flops there, an upper bound for the leaner Pallas kernel —
    so a ratio near 1.0 reads "at the compute roofline" and above 1.0
    reads "the model overcounts" (see flop_model.note).

Failures are LOUD: an error JSON line + exit 1, never a silent fallback.
"""

import json
import time
from typing import Optional

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Peak FLOP/s per chip for utilization accounting. MXU bf16: the published
# 197 Tbf16/s (TPU v5e / "v5 lite"). VPU f32 peak derived consistently from
# that same published number: 197e12 = 4 MXUs × 128×128 MACs × 2 flops ×
# clock → clock ≈ 1.50 GHz; VPU = 8 sublanes × 128 lanes × 4 ALU sub-units
# × 2 (FMA) × 1.50 GHz ≈ 12.3 Tf32/s.
_PEAKS = {"TPU v5 lite": {"vpu_f32": 12.3e12, "mxu_bf16": 197e12}}


def _make_chunk_fn(env, cfg, engine):
    from mbd_tpu.core.schedule import make_schedule
    from mbd_tpu.planners import mbd

    rng = jax.random.PRNGKey(0)
    rng, rng_reset = jax.random.split(rng)
    state_init = env.reset(rng_reset)
    sched = make_schedule(cfg.Ndiffuse, cfg.beta0, cfg.betaT)
    reverse_once = mbd.make_reverse_once(env, cfg, state_init, sched,
                                         engine=engine)
    return jax.jit(lambda c, s: jax.lax.scan(reverse_once, c, s))


def _bench(env_name: str, cfg_kwargs: dict, engine, target_s, chunk: int):
    from mbd_tpu import envs
    from mbd_tpu.planners import mbd

    env = envs.get_env(env_name)
    cfg = mbd.MBDConfig(**cfg_kwargs)
    engine = engine or mbd.default_engine(env)
    chunk_fn = _make_chunk_fn(env, cfg, engine)

    steps = jnp.arange(cfg.Ndiffuse - 1, 0, -1)
    n = steps.shape[0]
    pad = (-n) % chunk
    steps = jnp.concatenate([steps, jnp.ones(pad, steps.dtype)])

    def full_denoise():
        carry = (jax.random.PRNGKey(1),
                 jnp.zeros((cfg.Hsample, env.action_size)))
        rews = None
        for c in range(0, n + pad, chunk):
            carry, (_, rews) = chunk_fn(carry, steps[c:c + chunk])
        jax.block_until_ready(carry)
        return rews

    t_c = time.perf_counter()
    full_denoise()                      # compile
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    full_denoise()                      # timed
    dt = time.perf_counter() - t0

    n_env_steps = n * cfg.Nsample * cfg.Hsample
    vs = (target_s / dt) if target_s else 0.0
    return {
        "metric": f"{env_name} MBD denoise env-steps/sec/chip "
                  f"({engine} engine; Nsample={cfg.Nsample}, "
                  f"H={cfg.Hsample}, "
                  f"Ndiffuse={cfg.Ndiffuse}; full denoise wall={dt:.2f}s)",
        "value": round(n_env_steps / dt),
        "unit": "env-steps/sec",
        "vs_baseline": round(vs, 3),
        "wall_s": round(dt, 3),
        "compile_s": round(compile_s, 1),
        "env_steps": n_env_steps,
    }


def _flop_model(env_name: str, cfg_kwargs: dict, chunk: int, wall_s: float,
                n_steps: int):
    """Analytic-scale FLOP model: XLA cost-analysis of ONE physics substep
    (no scan/fori — XLA reports loop-body flops once, which is why
    analyzing the whole reverse step undercounts ~H·n_frames×), multiplied
    by the statically-known substep count of the denoise
    (n_steps · Hsample · n_frames), divided by the measured Pallas wall
    time. Reward/softmax/barycenter flops are excluded (sub-1% of the
    physics)."""
    from mbd_tpu import envs
    from mbd_tpu.sim import batched as BT

    env = envs.get_env(env_name)
    N = cfg_kwargs["Nsample"]
    H = cfg_kwargs["Hsample"]
    # same packed batch layout as the kernel: [dim, 8, N/8]
    q = jnp.broadcast_to(
        env.sys.init_q[:, None, None], (env.sys.nq, 8, N // 8))
    qd = jnp.zeros((env.sys.nv, 8, N // 8))
    u = jnp.zeros((env.sys.nu, 8, N // 8))
    sub = jax.jit(lambda q, qd, u: BT.substep_b(env.sys, q, qd, u))
    cost = sub.lower(q, qd, u).compile().cost_analysis()
    flops_per_substep = float(cost.get("flops", 0.0))
    total = flops_per_substep * n_steps * H * env.n_frames
    achieved = total / wall_s
    kind = jax.devices()[0].device_kind
    peaks = _PEAKS.get(kind, {})
    out = {
        "source": "XLA cost_analysis of one batched physics substep × "
                  "(Ndiffuse-1)·H·n_frames (same math the Pallas kernel "
                  "executes; loop bodies counted explicitly)",
        "note": "sparsity-unrolled HLO flop count of the XLA engine "
                "substep (TopoCache already prunes structurally-zero "
                "topology terms, so this is close to executed flops for "
                "the XLA path) — still an UPPER bound for the leaner "
                "Pallas kernel, and cost_analysis weights transcendentals "
                "(rsqrt/quaternion math) as multi-flop, so a ratio above "
                "1.0 means the flop model overcounts, not that the kernel "
                "beats the silicon; near 1.0 reads 'at the compute "
                "roofline'",
        "device_kind": kind,
        "flops_per_substep_batch": round(flops_per_substep),
        "substeps": n_steps * H * env.n_frames,
        "algorithmic_tflops_per_s": round(achieved / 1e12, 3),
    }
    for name, peak in peaks.items():
        out[f"algorithmic_vs_{name}_peak"] = round(achieved / peak, 4)
    return out


def _tunnel_reachable() -> bool:
    """Fast pre-probe of the axon relay: the TPU plugin reaches the chip
    through loopback TCP ports served by the host-spawned relay process.
    If the relay died (2026-08-17 outage), every port refuses instantly —
    probing them turns a 45-minute watchdog hang into an immediate loud
    error. Only meaningful when the environment routes jax to axon."""
    import os
    import socket

    if os.environ.get("JAX_PLATFORMS", "axon") != "axon" or \
            not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True          # not tunnel-routed; nothing to probe
    for port in (8082, 8083, 8087, 8092):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=2):
                return True
        except OSError:
            continue
    return False


# Best-so-far holder: every completed section updates this, and the
# watchdog PUBLISHES it instead of erroring when a later (riskier, e.g.
# cold-compile) section stalls. A stalled extra section costs its numbers,
# never the headline.
_BEST = {"result": None, "section": "startup"}


def _watchdog(seconds: float):
    """LOUD-failure guard: a hung backend (e.g. the TPU tunnel dying
    mid-session leaves the axon plugin retrying its connect forever) must
    still produce ONE JSON line, never an eternal hang. If a headline was
    already measured, the watchdog prints that (exit 0) with a note about
    which section stalled; only a stall before ANY result is an error
    (exit 1). Returns an Event to set on success."""
    import os
    import threading

    done = threading.Event()

    def _fire():
        if not done.wait(seconds):
            best = _BEST["result"]
            if best is not None:
                best["watchdog_expired_mid_section"] = _BEST["section"]
                print(json.dumps(best), flush=True)
                os._exit(0)
            print(json.dumps({
                "metric": "ERROR: bench watchdog expired",
                "value": 0, "unit": "env-steps/sec", "vs_baseline": 0.0,
                "error": f"no result within {seconds:.0f}s "
                         f"(backend unreachable or compile stall in "
                         f"section '{_BEST['section']}')",
            }), flush=True)
            os._exit(1)

    threading.Thread(target=_fire, daemon=True).start()
    return done


def _preflight_pallas(env_name: str) -> Optional[str]:
    """Lowering tripwire (VERDICT r3 item 3): actually compile the Pallas
    whole-rollout kernel through Mosaic on the live chip BEFORE the timed
    run. CPU tests run the kernel in interpret mode, so a Mosaic lowering
    regression (r3: the PGS sweep's dynamic_slice) is invisible to the
    suite — this is the only place it can be caught. Returns None when the
    kernel lowers and runs, else the error string."""
    import traceback

    from mbd_tpu import envs
    from mbd_tpu.ops.rollout_pallas import rollout_rewards_pallas

    try:
        env = envs.get_env(env_name)
        state0 = env.reset(jax.random.PRNGKey(0))
        Y = jnp.zeros((64, 4, env.action_size))
        fn = jax.jit(lambda s, y: rollout_rewards_pallas(env, s, y,
                                                         b_tile=64))
        jax.block_until_ready(fn(state0, Y))
        return None
    except Exception as e:  # noqa: BLE001
        return (f"{type(e).__name__}: {e}\n"
                + traceback.format_exc()[-1500:])


def main():
    import os
    import traceback

    if not _tunnel_reachable():
        print(json.dumps({
            "metric": "ERROR: TPU tunnel unreachable",
            "value": 0, "unit": "env-steps/sec", "vs_baseline": 0.0,
            "error": "axon relay ports refuse connections (relay process "
                     "down); no chip to bench. Last measured TPU result: "
                     "BENCH_r02.json (34.4M env-steps/s/chip).",
        }), flush=True)
        raise SystemExit(1)
    watchdog_s = float(os.environ.get("BENCH_WATCHDOG_S", "2700"))
    done = _watchdog(watchdog_s)
    t_start = time.perf_counter()
    north_cfg = dict(Nsample=1024, Hsample=50, Ndiffuse=300, temp_sample=0.1)
    flag_cfg = dict(Nsample=8192, Hsample=50, Ndiffuse=300, temp_sample=0.1)

    # Lowering tripwire: compile the Pallas kernel through Mosaic FIRST.
    # On failure the bench degrades to the XLA-fused engine and still
    # publishes that number — a kernel regression costs the round its
    # speed, never its perf evidence (VERDICT r3 item 3) — with the Mosaic
    # error carried loudly in the output.
    pallas_error = None
    engine = None
    if jax.default_backend() == "tpu":
        _BEST["section"] = "pallas_preflight"
        pallas_error = _preflight_pallas("humanoidrun")
        if pallas_error is not None:
            engine = "fused"
    try:
        _BEST["section"] = "headline_stacked_N1024"
        result = _bench("humanoidrun", north_cfg, engine=engine,
                        target_s=10.0, chunk=299)
        if pallas_error is None:
            result["pallas_lowering"] = "ok (kernel compiled+ran pre-flight)"
        _BEST["result"] = result
        # The extra sections each pay their own Mosaic compile on a cold
        # cache (minutes-class for the stacked precompute, HOUR-class for
        # the unrolled one — see sim/batched.py::precompute_variant and
        # docs/ROUND4.md §2). The HEADLINE number above is the contract;
        # each extra runs only while enough watchdog budget remains, and
        # a stall inside one publishes the best-so-far result instead of
        # erroring (see _watchdog).
        def _budget_left():
            return watchdog_s - (time.perf_counter() - t_start)

        if _budget_left() > 0.5 * watchdog_s:
            _BEST["section"] = "flagship_stacked_N8192"
            result["flagship_Nsample8192"] = _bench(
                "humanoidrun", flag_cfg, engine=engine, target_s=None,
                chunk=299)
            _BEST["result"] = result
        else:
            result["flagship_Nsample8192"] = {
                "skipped": f"only {_budget_left():.0f}s of watchdog budget "
                           "left — cold-cache Mosaic compile of the "
                           "Nsample=8192 program would exceed it"}
        if _budget_left() > 0.2 * watchdog_s:
            _BEST["section"] = "flop_model"
            result["flop_model"] = _flop_model(
                "humanoidrun", north_cfg, chunk=299,
                wall_s=result["wall_s"], n_steps=north_cfg["Ndiffuse"] - 1)
            _BEST["result"] = result
        else:
            result["flop_model"] = {
                "skipped": f"only {_budget_left():.0f}s of watchdog budget "
                           "left — cost_analysis of the substep HLO "
                           "deferred"}

        # The "unrolled" precompute variant: ~37% faster at runtime
        # (docs/BENCH_LIVE_r04.json) but hour-class cold Mosaic compiles.
        # Attempt it only on the healthy Pallas path; if its compile
        # stalls past the watchdog, the stacked headline above is what
        # gets published. When it succeeds AND beats the stacked wall,
        # it becomes the headline (the stacked numbers stay attached).
        # Gate on cache warmth: a seconds-class stacked compile means the
        # persistent .jax_cache is live (so the unrolled programs warmed
        # by the same queue run are too); a cold cache needs the full
        # hour-class budget to be worth starting.
        cache_warm = result.get("compile_s", 1e9) < 60
        if pallas_error is None and engine is None and \
                jax.default_backend() == "tpu" and \
                _budget_left() > (600 if cache_warm else 7200):
            from mbd_tpu.sim import batched as _BT
            _BEST["section"] = "headline_unrolled_N1024"
            with _BT.precompute_variant("unrolled"):
                un = _bench("humanoidrun", north_cfg, engine=None,
                            target_s=10.0, chunk=299)
                un["precompute_variant"] = "unrolled"
                if _budget_left() > 0.2 * watchdog_s:
                    _BEST["section"] = "flagship_unrolled_N8192"
                    un["flagship_Nsample8192"] = _bench(
                        "humanoidrun", flag_cfg, engine=None,
                        target_s=None, chunk=299)
                    un["flagship_Nsample8192"]["precompute_variant"] = \
                        "unrolled"
            if un["wall_s"] < result["wall_s"]:
                result["metric"] += " [stacked precompute]"
                un["metric"] += " [unrolled precompute]"
                un["pallas_lowering"] = result.get("pallas_lowering")
                fm = dict(result.get("flop_model") or {})
                if "flops_per_substep_batch" in fm:
                    # same substep count and flop model; rescale achieved
                    # throughput to the winning variant's wall time
                    total = fm["flops_per_substep_batch"] * fm["substeps"]
                    ach = total / un["wall_s"]
                    fm["algorithmic_tflops_per_s"] = round(ach / 1e12, 3)
                    for k in list(fm):
                        if k.startswith("algorithmic_vs_"):
                            peak = _PEAKS.get(fm.get("device_kind"), {}).get(
                                k[len("algorithmic_vs_"):-len("_peak")])
                            if peak:
                                fm[k] = round(ach / peak, 4)
                un["flop_model"] = fm
                un["stacked_variant"] = {
                    k: result[k] for k in ("metric", "value", "wall_s",
                                           "vs_baseline",
                                           "flagship_Nsample8192")
                    if k in result}
                result = un
            else:
                result["unrolled_variant"] = {
                    k: un[k] for k in ("metric", "value", "wall_s",
                                       "vs_baseline",
                                       "flagship_Nsample8192")
                    if k in un}
            _BEST["result"] = result
    except Exception as e:
        best = _BEST["result"]
        if best is not None:
            # a failure in a later section must not discard the headline
            best["section_error"] = {
                "section": _BEST["section"],
                "error": f"{type(e).__name__}: {e}",
                "traceback": traceback.format_exc()[-1500:],
            }
            if pallas_error is not None:
                best["metric"] = ("DEGRADED (Pallas kernel failed Mosaic "
                                  "lowering; XLA-fused engine measured "
                                  "instead): " + best["metric"])
                best["pallas_lowering_error"] = pallas_error
            done.set()
            print(json.dumps(best))
            return
        print(json.dumps({
            "metric": "ERROR: humanoidrun denoise bench failed",
            "value": 0, "unit": "env-steps/sec", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
            "traceback": traceback.format_exc()[-2000:],
        }))
        raise SystemExit(1)
    done.set()
    if pallas_error is not None:
        result["metric"] = ("DEGRADED (Pallas kernel failed Mosaic "
                            "lowering; XLA-fused engine measured instead): "
                            + result["metric"])
        result["pallas_lowering_error"] = pallas_error
    print(json.dumps(result))


if __name__ == "__main__":
    main()
