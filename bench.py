"""Benchmark: AL-cycle throughput on one chip.

Headline (the ONE stdout JSON line, printed as soon as the first
measurement lands so a later-stage timeout still parses): whole-video heatmap
inference + scoring throughput — the hot path of eval_and_query
(ActiveLearning.py:273-429), SimplePose-R50 over 256x192 crops in bf16 plus
the fused scoring stage (decode, OKS, THC shifted-gather, local-peak
combine weight).

Timing methodology (IMPORTANT): on the axon-tunnelled TPU,
`block_until_ready()` does NOT synchronize (measured here: an 8192^3 bf16
matmul "completed" in 0.20 ms = 28x over the v5e published peak).  Every
figure below therefore runs K chained iterations inside ONE jitted
`lax.fori_loop` whose body consumes the carried scalar (preventing CSE and
loop-hoisting) and whose scalar checksum is `device_get`'d; per-iteration
time is (t[K_hi] - t[K_lo]) / (K_hi - K_lo), which cancels dispatch and
transfer overhead.  K is a TRACED scalar (dynamic while-loop trip count),
so ONE compiled program serves both K values — this halves the cold-cache
compile wall vs the r2-r4 two-program scheme and removes compile variance
between the two measurements.  Validated: the chained 8192^3 bf16 matmul
measures 195.1 TF/s = 99% of the v5e peak (197 TF/s).  Round-1 numbers
measured with block_until_ready are NOT comparable.

Cold-cache behavior (the r4 rc=124 lesson): every measurement prints a
`[bench] key = value` line as it lands AND rewrites BENCH_DETAIL.json
incrementally, so a driver timeout still records everything measured so
far; each chained program's `lower().compile()` wall is itself recorded
as `compile_s_*`.  The r4 timeout was a single 406-s compile of the
einsum-form folded-BN chain inside the loop body — fixed by expressing
the folded tails as 1x1 convs (kernels/fused_bottleneck.py
bottleneck_chain_conv; exp/profile_compile.py: 406 s -> 13 s).

Also measured and written to BENCH_DETAIL.json:
  - f32 parity-mode throughput,
  - retrain-step throughput (fwd+bwd+AdamW, batch 120 — retrain dominates
    real cycles: exp cycle_times show retrain 45-66 s vs score 1.5 s),
  - a full synthetic AL cycle (score + select + retrain epoch),
  - MFU from XLA cost analysis vs the v5e bf16 peak,
  - the measured same-host algorithmic anchor: the actual reference code
    (torch CPU, via tests/refbridge) vs this framework on one CPU core ran
    1.77 s/sample vs 0.53 s/sample on the shared fixture → 3.32x
    (exp/host_ab_bench.py, 2026-08-16) — a measurement, unlike the A100
    estimate below.

vs_baseline: the reference publishes no numbers (BASELINE.md).  The ratio
is measured-fps / 700, where 700 samples/s is a documented engineering
ESTIMATE of the reference on one A100 (batch-1080 fp32 SimpleBaseline
~2100 img/s ÷ 3 forwards per sample for THC).  Estimate-derived: treat
accordingly; the measured CPU A/B above is the grounded anchor.
"""

import json
import time

import numpy as np

REF_A100_SAMPLES_PER_S = 700.0       # documented estimate (see docstring)
SAME_HOST_AB_SPEEDUP = 3.32          # MEASURED: exp/host_ab_bench.py
V5E_BF16_PEAK_FLOPS = 197e12         # TPU v5e published bf16 peak

BATCH = 512
ITERS = 8                            # K_hi - K_lo for the chained timing
RETRAIN_BATCH = 120

_DETAIL = {}
_T_START = time.perf_counter()


def _emit(key, value):
    """Record one measurement: detail dict + stdout line + incremental
    BENCH_DETAIL.json rewrite (a driver timeout keeps everything so far)."""
    _DETAIL[key] = value
    print(f"[bench] {key} = {value}", flush=True)
    with open("BENCH_DETAIL.json", "w") as f:
        json.dump(_DETAIL, f, indent=2)


def _cost_flops(c):
    c = c[0] if isinstance(c, (list, tuple)) else c
    try:
        return float(c.get("flops", 0.0))
    except Exception:
        return 0.0


def _flops_of(fn, *args):
    """FLOPs of one program via cost analysis on the LOWERED module when the
    backend supports it (no backend compile — saves 10-40 s/program cold);
    falls back to compiling."""
    import jax
    lowered = jax.jit(fn).lower(*args)
    try:
        fl = _cost_flops(lowered.cost_analysis())
        if fl > 0:
            return fl
    except Exception:
        pass
    return _cost_flops(lowered.compile().cost_analysis())


def _bench_chain(make_loop, *args, iters=ITERS, name=""):
    """Per-iteration wall time of the K-chained loop (see module docstring).

    make_loop() returns a jitted fn (K, *args) -> scalar with K a traced
    trip count: one compile serves both the K_lo and K_hi timings."""
    import jax
    import jax.numpy as jnp
    loop = make_loop()
    if name:
        # marks WHERE a driver-budget timeout struck (compile walls through
        # the tunnelled TPU can stall arbitrarily when the tunnel drops)
        print(f"[bench] compiling {name} ...", flush=True)
    t0 = time.perf_counter()
    c = loop.lower(jnp.int32(2), *args).compile()
    if name:
        _emit(f"compile_s_{name}", round(time.perf_counter() - t0, 1))
    k_lo, k_hi = jnp.int32(2), jnp.int32(2 + iters)
    jax.device_get(c(k_lo, *args))
    jax.device_get(c(k_hi, *args))
    t0 = time.perf_counter()
    jax.device_get(c(k_lo, *args))
    d_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(c(k_hi, *args))
    d_hi = time.perf_counter() - t0
    return (d_hi - d_lo) / iters


def _bench_chain_static(make_loop, *args, iters=ITERS):
    """Legacy two-program chained timing kept for the exp/ profilers:
    make_loop(K) returns a jitted fn(*args) -> scalar with K baked in as a
    static trip count.  Returns (seconds_per_iter, 0.0) — the profilers
    ignore the FLOPs slot.  New code should use _bench_chain (one program,
    traced K)."""
    import jax
    lo = make_loop(2).lower(*args).compile()
    hi = make_loop(2 + iters).lower(*args).compile()
    jax.device_get(lo(*args))
    jax.device_get(hi(*args))
    t0 = time.perf_counter()
    jax.device_get(lo(*args))
    d_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(hi(*args))
    d_hi = time.perf_counter() - t0
    return (d_hi - d_lo) / iters, 0.0


def main():
    import jax
    from vatl4pose_tpu.utils.runtime import setup_jax_cache
    setup_jax_cache()
    import jax.numpy as jnp
    from jax import lax
    from vatl4pose_tpu.models import SimplePose
    from vatl4pose_tpu.models.criterion import masked_heatmap_loss
    from vatl4pose_tpu.ops import (compute_oks, crop_batch, heatmap_to_coord,
                                   localpeak_mean, thc_scores)
    from vatl4pose_tpu.train.optim import (build_optimizer, init_state,
                                           lr_multiplier_tree)

    model = SimplePose(num_joints=17, num_layers=50, train=False)
    # bf16 serving model: folded-BN stage tails (same param tree; measured
    # 54.0 -> 51.9 ms forward @512 on v5e — exp/FUSED_BOTTLENECK.md).  The
    # f32 parity path keeps the exact graph.
    model_fused = SimplePose(num_joints=17, num_layers=50, train=False,
                             fused_eval=True)
    rng = np.random.default_rng(0)
    # the WHOLE device pipeline is measured from decoded full frames:
    # crop_batch (separable MXU warp + normalize) -> forward -> decode ->
    # OKS/THC/G_c.  Earlier rounds benched from pre-made crops, which hid
    # the warp: the old gather-based warp cost ~2.9 ms/crop (more than the
    # model forward) and dominated the real score phase.
    frames = jnp.asarray(rng.uniform(0, 255, (80, 240, 320, 3)), jnp.float32)
    frame_idx = jnp.asarray(rng.integers(0, 80, BATCH))
    raw_bbox = jnp.asarray(
        np.stack([rng.uniform(0, 100, BATCH), rng.uniform(0, 80, BATCH),
                  rng.uniform(150, 300, BATCH), rng.uniform(120, 230, BATCH)],
                 1), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 192, 3), jnp.float32)))
    variables = jax.tree.map(
        lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape), a.dtype), shapes)
    var_bf16 = jax.tree.map(
        lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
        variables)
    gt = jnp.asarray(rng.uniform(0, 200, (BATCH, 51)), jnp.float32)
    bb_ann = jnp.asarray(np.tile([[10.0, 20.0, 96.0, 128.0]], (BATCH, 1)),
                         jnp.float32)
    ones = jnp.asarray(np.ones(BATCH, bool))

    def score_body(variables, fr, bf16):
        # mirrors ScoringEngine._forward_chunk: single-pass MXU warp under
        # bf16 serving, 3-pass in f32 parity mode
        crops, bbox_crop = crop_batch(
            fr, frame_idx, raw_bbox, (256, 192),
            precision=jax.lax.Precision.DEFAULT if bf16 else None)
        hm = (model_fused if bf16 else model).apply(
            variables, crops.astype(jnp.bfloat16) if bf16 else crops)
        # stays bf16 under serving: stage-2 consumers upcast at entry
        hm = jnp.transpose(hm, (0, 3, 1, 2))
        coords, scores = heatmap_to_coord(hm, bbox_crop)
        kpts = jnp.concatenate([coords, scores[..., None]],
                               -1).reshape(BATCH, -1)
        oks = compute_oks(kpts, gt, bb_ann)
        thc = thc_scores(hm, ones, ones)
        gc = localpeak_mean(hm)
        return oks.sum() + thc.sum() + gc.sum() + coords.mean()

    def make_score_loop(bf16=True):
        @jax.jit
        def loop(K, variables, frames):
            def body(i, acc):
                # the carried scalar feeds the input: serializes iterations
                fr = frames * (1 + acc * 1e-20)
                return acc + score_body(variables, fr, bf16)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return loop

    # bf16 serving path (warp/decode/scoring stay f32)
    dt_bf16 = _bench_chain(make_score_loop, var_bf16, frames,
                           name="score_bf16")
    fps = BATCH / dt_bf16
    _emit("score_bf16_samples_per_s", round(fps, 1))
    # the ONE stdout JSON line, printed as soon as the headline lands (NOT
    # last): if the tunnel stalls a later program's compile past the driver
    # budget, the round still records a parseable headline (r4 lesson)
    print(json.dumps({
        "metric": "frames/sec/chip (crop+inference+scoring)",
        "value": round(fps, 1),
        "unit": "samples/s",
        # estimate-derived (measured fps / 700 samples/s A100 engineering
        # ESTIMATE — the reference publishes no numbers, BASELINE.md);
        # vs_baseline_measured is the grounded anchor: same-host CPU A/B
        # against the actual reference code (exp/host_ab_bench.py)
        "vs_baseline": round(fps / REF_A100_SAMPLES_PER_S, 2),
        "vs_baseline_measured": SAME_HOST_AB_SPEEDUP,
    }), flush=True)

    # MFU: cost ONE unchained step (lowered-module analysis where supported)
    fl_step = _flops_of(
        lambda v, fr: score_body(v, fr, True), var_bf16, frames)
    if fl_step > 0:
        _emit("score_step_tflops", round(fl_step / 1e12, 2))
        _emit("score_bf16_mfu_vs_v5e_peak",
              round(fl_step / dt_bf16 / V5E_BF16_PEAK_FLOPS, 3))

    # f32 parity mode
    dt_f32 = _bench_chain(lambda: make_score_loop(False), variables, frames,
                          name="score_f32")
    _emit("score_f32_samples_per_s", round(BATCH / dt_f32, 1))

    # retrain step: fwd+bwd+per-group AdamW at the production batch size;
    # the param/opt-state carry serializes iterations by construction
    model_t = SimplePose(num_joints=17, num_layers=50, train=True)
    update_fn, group_of = build_optimizer(
        {"OPTIMIZER": "AdamW", "LR": 2.5e-4, "WEIGHT_DECAY": 0.7},
        "SimplePose")
    opt_state = init_state(variables["params"])
    xr = jnp.asarray(rng.normal(0, 1, (RETRAIN_BATCH, 256, 192, 3)),
                     jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (RETRAIN_BATCH, 64, 48, 17)),
                         jnp.float32)
    tw = jnp.ones((RETRAIN_BATCH, 17), jnp.float32)
    valid = jnp.ones((RETRAIN_BATCH,), bool)

    def train_step(variables, opt_state, x, bf16=False):
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            if bf16:   # mixed precision: bf16 compute, f32 master weights
                p = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, p)
            out, new_state = model_t.apply(
                {"params": p, **rest},
                x.astype(jnp.bfloat16) if bf16 else x,
                mutable=["batch_stats"])
            out = out.astype(jnp.float32)
            return masked_heatmap_loss(out, target, tw[:, None, None, :],
                                       valid=valid), new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        mults = lr_multiplier_tree(params, group_of)
        new_params, new_opt = update_fn(params, grads, opt_state,
                                        jnp.asarray(2.5e-4), mults)
        return {"params": new_params, **new_state}, new_opt, loss

    def make_train_loop(bf16=False):
        @jax.jit
        def loop(K, variables, opt_state, x):
            def body(i, carry):
                v, o, acc = carry
                v, o, loss = train_step(v, o, x, bf16)
                return (v, o, acc + loss)
            return lax.fori_loop(0, K, body,
                                 (variables, opt_state, jnp.float32(0)))[2]
        return loop

    dt_tr = _bench_chain(make_train_loop, variables, opt_state, xr,
                         iters=4, name="retrain_f32")
    _emit("retrain_samples_per_s", round(RETRAIN_BATCH / dt_tr, 1))
    _emit("retrain_step_ms", round(dt_tr * 1e3, 1))
    fl_tr = _flops_of(lambda v, o, x: train_step(v, o, x, False),
                      variables, opt_state, xr)
    if fl_tr > 0:
        _emit("retrain_step_tflops", round(fl_tr / 1e12, 2))
        # f32-precision step timed against the bf16 MXU peak (on v5e, f32
        # convs at default precision execute as bf16 multiplies with f32
        # accumulation, so one peak serves both dtypes — FORWARD_PROFILE.md)
        _emit("retrain_f32_mfu_vs_v5e_bf16_peak",
              round(fl_tr / dt_tr / V5E_BF16_PEAK_FLOPS, 3))

    # mixed-precision retrain (RETRAIN.BF16 / --speedup in the AL loop)
    dt_trb = _bench_chain(lambda: make_train_loop(True), variables,
                          opt_state, xr, iters=4, name="retrain_bf16")
    _emit("retrain_bf16_samples_per_s", round(RETRAIN_BATCH / dt_trb, 1))
    _emit("retrain_bf16_step_ms", round(dt_trb * 1e3, 1))
    fl_trb = _flops_of(lambda v, o, x: train_step(v, o, x, True),
                       variables, opt_state, xr)
    if fl_trb > 0:
        _emit("retrain_bf16_mfu_vs_v5e_peak",
              round(fl_trb / dt_trb / V5E_BF16_PEAK_FLOPS, 3))

    # REAL retrain wall (what the AL loop pays): Retrainer.retrain over the
    # scan-chunked path — device warp (rotation kernel), gaussian targets,
    # fwd+bwd, per-group AdamW, fused PCK — 16 steps warm, from frames.
    import types

    from vatl4pose_tpu.train.retrain import Retrainer
    from vatl4pose_tpu.data.pipeline import AugCfg

    n_samp = 240
    d = types.SimpleNamespace(          # the fields retrain() reads
        frame_idx=np.asarray(rng.integers(0, 80, n_samp)),
        bboxes=np.asarray(np.stack(
            [rng.uniform(0, 100, n_samp), rng.uniform(0, 80, n_samp),
             rng.uniform(150, 300, n_samp), rng.uniform(120, 230, n_samp)],
            1), np.float32),
        joints_xy=rng.uniform(20, 200, (n_samp, 17, 2)).astype(np.float32),
        joints_vis=np.ones((n_samp, 17), np.float32))
    tr = Retrainer(model_t, {"OPTIMIZER": "AdamW", "LR": 2.5e-4,
                             "WEIGHT_DECAY": 0.7, "BATCH_SIZE": RETRAIN_BATCH},
                   "SimplePose", aug=AugCfg(), joint_pairs=[], seed=166)
    tr_vars = {"params": variables["params"],
               "batch_stats": jax.tree.map(
                   jnp.zeros_like,
                   model_t.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 256, 192, 3)))["batch_stats"])}
    tr_opt = init_state(tr_vars["params"])
    idx = np.arange(n_samp)
    t0 = time.perf_counter()
    tr_vars, tr_opt, _, _ = tr.retrain(tr_vars, tr_opt, d, frames, idx, 8,
                                       (320, 240))          # compile warm-up
    _emit("compile_s_retrain_wall", round(time.perf_counter() - t0, 1))
    t0 = time.perf_counter()
    tr_vars, tr_opt, _, _ = tr.retrain(tr_vars, tr_opt, d, frames, idx, 8,
                                       (320, 240))
    dt_full = time.perf_counter() - t0
    _emit("retrain_wall_16steps_s", round(dt_full, 2))
    _emit("retrain_wall_samples_per_s", round(16 * RETRAIN_BATCH / dt_full, 1))

    # full-cycle estimate at production shape: score a 512-sample video +
    # one coreset selection + one retrain epoch over 120 samples.
    # coreset_selection returns host ints (device_get inside) so plain
    # wall-clock around it is already honest.
    from vatl4pose_tpu.al.selection import coreset_selection
    emb = rng.normal(0, 1, (BATCH, 2048)).astype(np.float32)
    unc = rng.uniform(size=BATCH).astype(np.float32)
    t0 = time.perf_counter()
    coreset_selection(emb, unc, list(range(24)), 26, 0.01, 0.5)
    _emit("coreset_select_s_cold", round(time.perf_counter() - t0, 3))
    t0 = time.perf_counter()
    coreset_selection(emb, unc, list(range(50)), 26, 0.01, 0.55)
    _emit("coreset_select_s_warm", round(time.perf_counter() - t0, 3))
    _emit("full_cycle_s_512_samples",
          round(dt_bf16 + _DETAIL["coreset_select_s_warm"] + dt_tr, 3))

    _emit("timing_methodology",
          "chained lax.fori_loop (traced trip count: one program per "
          "measurement) + scalar-checksum device_get (block_until_ready "
          "does not sync through the axon tunnel; method validated at 99% "
          "of v5e peak on an 8192^3 bf16 matmul)")
    _emit("same_host_cpu_ab_speedup_measured", SAME_HOST_AB_SPEEDUP)
    _emit("ref_anchor", {
        "a100_estimate_samples_per_s": REF_A100_SAMPLES_PER_S,
        "provenance": "engineering estimate (see bench.py docstring); "
                      "measured anchor = same-host CPU A/B vs the actual "
                      "reference code: 1.77 vs 0.53 s/sample (3.32x)",
    })
    _emit("bench_total_wall_s", round(time.perf_counter() - _T_START, 1))


def zoo():
    """Model-zoo forward throughput (bf16, batch 512) — the other two
    estimator families (`python bench.py --zoo`, writes BENCH_ZOO.json)."""
    import jax
    from vatl4pose_tpu.utils.runtime import setup_jax_cache
    setup_jax_cache()
    import jax.numpy as jnp
    from jax import lax
    from vatl4pose_tpu.models import (FastPose, PoseHighResolutionNet,
                                      SimplePose)

    rng = np.random.default_rng(0)
    out = {}
    for name, model in (
            ("SimplePose_R50", SimplePose(num_joints=17, num_layers=50)),
            ("FastPose_SE_R50_DUC", FastPose(num_joints=17, num_layers=50)),
            ("HRNet_W32", PoseHighResolutionNet(num_joints=17))):
        shapes = jax.eval_shape(
            lambda m=model: m.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 256, 192, 3), jnp.float32)))
        var = jax.tree.map(
            lambda a: jnp.asarray(rng.normal(0, 0.05, a.shape),
                                  jnp.bfloat16 if a.dtype == jnp.float32
                                  else a.dtype), shapes)
        x = jnp.asarray(rng.normal(0, 1, (BATCH, 256, 192, 3)), jnp.bfloat16)

        def make_loop(model=model):
            @jax.jit
            def loop(K, v, x):
                def body(i, acc):
                    xi = x * (1 + acc * 1e-20).astype(x.dtype)
                    hm = model.apply(v, xi)
                    return acc + jnp.mean(hm).astype(jnp.float32)
                return lax.fori_loop(0, K, body, jnp.float32(0))
            return loop

        dt = _bench_chain(make_loop, var, x)
        fl = _flops_of(lambda v, x, model=model: model.apply(v, x), var, x)
        out[name] = {"samples_per_s": round(BATCH / dt, 1),
                     "step_ms": round(dt * 1e3, 1)}
        if fl > 0:
            out[name]["mfu_vs_v5e_peak"] = round(
                fl / dt / V5E_BF16_PEAK_FLOPS, 3)
        print(name, out[name], flush=True)
    with open("BENCH_ZOO.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    import sys
    if "--zoo" in sys.argv:
        zoo()
    else:
        main()
