#!/usr/bin/env python
"""Training-throughput benchmark on the flagship workload.

Measures end-to-end training throughput (forward + backward + AdamW update)
of the GAOT model at the reference's Poisson-Gauss scale
(config/examples/time_indep/poisson_gauss.json: 8k+ scattered nodes,
64x64 latent grid, patch 2, transformer hidden 256, batch 64) on the
available accelerator, and prints ONE JSON line:

    {"metric": "train_throughput", "value": N, "unit": "samples/sec/chip",
     "vs_baseline": R}

vs_baseline compares against bench_baseline.json if present (written by a
previous round); otherwise 1.0.
"""
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_workload(batch_size=64, num_nodes=8192, latent=(64, 64), seed=0,
                   compute_dtype="bfloat16", attn_backend="auto",
                   use_tgraph=False, use_buckets=False, with_scan=True):
    import jax
    import jax.numpy as jnp
    import optax

    from gaot_tpu.core.config import ModelConfig, OptimizerConfig, merge_config
    from gaot_tpu.data.graph_builder import GraphBuilder, prepare_fx_device_graphs
    from gaot_tpu.models import GAOT
    from gaot_tpu.train.schedules import make_optimizer
    from gaot_tpu.train.static_trainer import masked_mse

    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (num_nodes, 2)).astype(np.float32)
    axes = [np.linspace(-1, 1, latent[0]), np.linspace(-1, 1, latent[1])]
    lat = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 2).astype(np.float32)

    model_cfg = merge_config(ModelConfig, {
        "latent_tokens_size": list(latent),
        "args": {
            "magno": {"coord_dim": 2, "radius": 0.033, "hidden_size": 64,
                      "mlp_layers": 3, "lifting_channels": 64,
                      "use_transpose_backward": use_tgraph,
                      "use_query_bucketing": use_buckets},
            "transformer": {"patch_size": 2, "hidden_size": 256, "num_layers": 3,
                            "attn_backend": attn_backend},
        },
    })
    builder = GraphBuilder()
    t0 = time.perf_counter()
    enc_h, dec_h = builder.build_fx_graphs(coords, lat, 0.033, [1.0])
    enc, dec, enc_t, dec_t = prepare_fx_device_graphs(
        enc_h, dec_h, num_nodes, lat.shape[0], model_cfg.args.magno)
    log(f"graph build: {time.perf_counter() - t0:.2f}s "
        f"enc K={enc_h[0].k} dec K={dec_h[0].k} "
        f"bucketed={'yes' if use_buckets else 'no'}")

    dtype = {"float32": None, "bfloat16": jnp.bfloat16}[compute_dtype]
    model = GAOT(input_size=1, output_size=1, config=model_cfg, dtype=dtype)
    latent_j = jnp.asarray(lat)
    coords_j = jnp.asarray(coords)
    pndata = jnp.asarray(rng.normal(size=(batch_size, num_nodes, 1)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(batch_size, num_nodes, 1)).astype(np.float32))
    mask = np.ones((batch_size,), dtype=bool)  # numpy: embeds without a D2H

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.key(0), latent_j, coords_j, pndata, enc, dec)
    log(f"init: {time.perf_counter() - t0:.2f}s, "
        f"params={sum(p.size for p in jax.tree.leaves(params))}")

    opt_cfg = merge_config(OptimizerConfig, {
        "name": "adamw",
        "args": {"lr": 8e-4, "weight_decay": 1e-5, "epoch": 1000},
    })
    tx, _ = make_optimizer(opt_cfg, steps_per_epoch=32)
    opt_state = tx.init(params)

    from functools import partial

    # Device-resident model inputs ride as a jit ARGUMENT, never a closure:
    # lowering embeds closure-captured jax.Arrays as MLIR constants, which
    # fetches each one device→host — on the tunneled TPU that serialized the
    # whole dataset through the link at every (re)trace and dominated warmup
    # (probe: 152 s trace+lower vs 8 s compile on a warm cache,
    # scripts/compile_probe.py).
    data = {"latent": latent_j, "coords": coords_j,
            "enc": enc, "dec": dec, "enc_t": enc_t, "dec_t": dec_t}

    @partial(jax.jit, donate_argnums=(1, 2))
    def _train_step(data, params, opt_state, rng_key, pndata, target):
        def loss_fn(p):
            pred = model.apply(p, data["latent"], data["coords"], pndata,
                               data["enc"], data["dec"],
                               training=True, rngs={"edge_drop": rng_key},
                               encoder_tgraphs=data["enc_t"],
                               decoder_tgraphs=data["dec_t"])
            return masked_mse(pred, target, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    train_step = partial(_train_step, data)

    if not with_scan:
        return train_step, None, None, params, opt_state, pndata, target

    # Whole-epoch scan over a device-resident dataset — the trainers' actual
    # training path for dataset.device_data (base_trainer._build_epoch_fn):
    # per scan step, gather the batch by index and run the same update.
    train_size = int(os.environ.get("BENCH_TRAIN_SIZE", 2048))
    dev = {
        **data,
        "c": jnp.asarray(rng.normal(
            size=(train_size, num_nodes, 1)).astype(np.float32)),
        "u": jnp.asarray(rng.normal(
            size=(train_size, num_nodes, 1)).astype(np.float32)),
    }

    @partial(jax.jit, donate_argnums=(1, 2))
    def _epoch_fn(dev, params, opt_state, rng_key, idx):
        def body(carry, xs):
            params, opt_state = carry
            i, step = xs

            def loss_fn(p):
                pred = model.apply(p, dev["latent"], dev["coords"],
                                   dev["c"][i], dev["enc"], dev["dec"],
                                   training=True,
                                   rngs={"edge_drop": jax.random.fold_in(
                                       rng_key, step)},
                                   encoder_tgraphs=dev["enc_t"],
                                   decoder_tgraphs=dev["dec_t"])
                return masked_mse(pred, dev["u"][i], mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        k = idx.shape[0]
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            (idx, jnp.arange(k, dtype=jnp.int32)))
        return params, opt_state, losses

    epoch_fn = partial(_epoch_fn, dev)

    def make_epoch_indices(epoch_rng, k):
        # Wrap the permutation when k*batch_size exceeds the dataset (large
        # BENCH_BATCH / BENCH_SCAN_STEPS) — sample reuse is fine for timing.
        perm = epoch_rng.permutation(train_size)
        return jnp.asarray(np.resize(perm, k * batch_size)
                           .reshape(k, batch_size).astype(np.int32))

    return (train_step, epoch_fn, make_epoch_indices, params, opt_state,
            pndata, target)


def build_vx_workload(batch_size=16, num_nodes=8192, train_size=64,
                      latent=(64, 64), seed=0, compute_dtype="bfloat16",
                      use_tgraph=True, use_buckets=True):
    """Variable-coordinate (airfoil-like) training workload: per-sample
    coordinates and graphs, device-resident split stacks, device-side batch
    gather — the shape of work the trainers' vx path does per step.
    Airfoil scale per the reference datasets (naca0012/rae2822: 5-20k nodes,
    src/datasets/dataset.py:59-127)."""
    import jax
    import jax.numpy as jnp
    import optax

    from gaot_tpu.core.config import ModelConfig, OptimizerConfig, merge_config
    from gaot_tpu.data.graph_builder import GraphBuilder
    from gaot_tpu.models import GAOT
    from gaot_tpu.train.schedules import make_optimizer
    from gaot_tpu.train.static_trainer import masked_mse

    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, (train_size, num_nodes, 2)).astype(np.float32)
    # Morton node ordering is the GraphBuilder default (config
    # magno.morton_ordering); BENCH_MORTON=0 ablates it.
    morton = os.environ.get("BENCH_MORTON", "1") == "1"
    axes = [np.linspace(-1, 1, latent[0]), np.linspace(-1, 1, latent[1])]
    lat = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 2).astype(np.float32)

    model_cfg = merge_config(ModelConfig, {
        "latent_tokens_size": list(latent),
        "args": {
            "magno": {"coord_dim": 2, "radius": 0.033, "hidden_size": 64,
                      "mlp_layers": 3, "lifting_channels": 64,
                      "use_transpose_backward": use_tgraph,
                      "use_query_bucketing": use_buckets,
                      "morton_ordering": morton},
            "transformer": {"patch_size": 2, "hidden_size": 256,
                            "num_layers": 3},
        },
    })
    builder = GraphBuilder.from_magno_config(model_cfg.args.magno)
    t0 = time.perf_counter()
    split = builder.build_vx_split(coords, lat, 0.033, [1.0])
    k_enc, k_dec = split.encoder[0].k, split.decoder[0].k
    if use_buckets:
        from gaot_tpu.data.graph_builder import bucketize_vx_splits

        bucketize_vx_splits([split], lat.shape[0], 1, use_tgraph)
    if use_tgraph:
        from gaot_tpu.data.graph_builder import attach_transpose_graphs

        attach_transpose_graphs([split], lat.shape[0], 1)

    def fmt(g):
        from gaot_tpu.ops.padding import BatchedBucketedGraph

        if isinstance(g, BatchedBucketedGraph):
            return ("buckets " + ",".join(f"{r}x{k}" for r, k in
                                          zip(g.bucket_rows, g.bucket_ks)))
        return f"dense K={g.k}"

    log(f"vx graph build ({train_size} samples x {num_nodes} nodes): "
        f"{time.perf_counter() - t0:.2f}s raw enc K={k_enc} dec K={k_dec}; "
        f"enc {fmt(split.encoder[0])}; dec {fmt(split.decoder[0])}")

    dtype = {"float32": None, "bfloat16": jnp.bfloat16}[compute_dtype]
    model = GAOT(input_size=1, output_size=1, config=model_cfg, dtype=dtype)
    latent_j = jnp.asarray(lat)

    from gaot_tpu.data.graph_builder import vx_batch_graphs, vx_graph_buffers

    bufs = vx_graph_buffers(split)
    bufs.pop("node_perm", None)  # build-time layout record, not a step input
    dev = jax.device_put({
        **bufs,
        "c": rng.normal(
            size=(train_size, split.coords.shape[1], 1)).astype(np.float32),
        "u": rng.normal(
            size=(train_size, split.coords.shape[1], 1)).astype(np.float32),
    })

    def batch_args(i):
        gathered = {k: v[i] for k, v in dev.items() if k not in ("c", "u")}
        enc, dec, enc_t, dec_t = vx_batch_graphs(gathered, 1)
        return enc, dec, enc_t, dec_t

    i0 = jnp.arange(batch_size, dtype=jnp.int32)
    enc, dec, enc_t, dec_t = batch_args(i0)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.key(0), latent_j, dev["x"][i0],
                                 dev["c"][i0], enc, dec)
    log(f"init: {time.perf_counter() - t0:.2f}s, "
        f"params={sum(p.size for p in jax.tree.leaves(params))}")

    opt_cfg = merge_config(OptimizerConfig, {
        "name": "adamw",
        "args": {"lr": 8e-4, "weight_decay": 1e-5, "epoch": 1000},
    })
    tx, _ = make_optimizer(opt_cfg, steps_per_epoch=max(1, train_size // batch_size))
    opt_state = tx.init(params)
    mask = np.ones((batch_size,), dtype=bool)  # numpy: embeds without a D2H

    from functools import partial

    # dev rides as a jit ARGUMENT (see build_workload): closure-captured
    # jax.Arrays are fetched device→host at every (re)trace to embed as MLIR
    # constants — the dominant warmup cost on the tunneled TPU.
    dev = {**dev, "latent": latent_j}

    @partial(jax.jit, donate_argnums=(2,))
    def _train_step(dev, params, opt_state, rng_key, i):
        gathered = {k: v[i] for k, v in dev.items()
                    if k not in ("c", "u", "latent")}
        enc, dec, enc_t, dec_t = vx_batch_graphs(gathered, 1)

        def loss_fn(p):
            pred = model.apply(p, dev["latent"], dev["x"][i], dev["c"][i],
                               enc, dec,
                               training=True, rngs={"edge_drop": rng_key},
                               encoder_tgraphs=enc_t, decoder_tgraphs=dec_t)
            return masked_mse(pred, dev["u"][i], mask, dev["node_mask"][i])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    train_step = partial(_train_step, dev)

    def make_indices(step_rng):
        return jnp.asarray(step_rng.integers(0, train_size, batch_size,
                                             ).astype(np.int32))

    return train_step, make_indices, params, opt_state


_PEAK_BF16_FLOPS = {
    # Published dense-matmul peaks (TFLOP/s, bf16) by device_kind prefix.
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # Trillium
    "TPU v6": 918e12,
}


def device_peak_flops():
    import jax

    kind = jax.devices()[0].device_kind
    # Longest-prefix match so 'TPU v5 lite' wins over 'TPU v5'.
    best = None
    for prefix, peak in _PEAK_BF16_FLOPS.items():
        if kind.startswith(prefix) and (best is None or len(prefix) > len(best[0])):
            best = (prefix, peak)
    return kind, (best[1] if best else None)


def compiled_flops(jitted, *args, **kwargs):
    """Per-dispatch FLOPs from XLA's own cost model (forward + backward +
    optimizer — everything inside the compiled program).

    XLA's cost analysis cannot see inside Pallas custom calls, so the step
    is re-lowered with every Pallas path forced off (fused AGNO, fused FFN,
    flash attention — the env gates are read at trace time). The math is
    identical on either path, so the pure-XLA count is the honest FLOP
    number for the fused program's measured timing."""
    overrides = {"GAOT_FUSED_FFN": "0",
                 "GAOT_ATTN_BACKEND": "xla",
                 # Unroll the per-sample d_f scans at trace time: XLA's cost
                 # model counts a while-loop body once regardless of trip
                 # count, which under-counted the vx backward by ~the batch
                 # size (round-3 verdict: 7.1 vs 15.56 GF/sample for the
                 # same math). ops/gather_apply.py::_scan_unroll.
                 "GAOT_FLOPS_UNROLL": "1"}
    import functools

    import jax

    if isinstance(jitted, functools.partial):
        # Workload step functions bind their device-resident data with
        # functools.partial (data as jit argument, not closure constants).
        args = (*jitted.args, *args)
        jitted = jitted.func
    # Re-jit the UNDERLYING python function: calling .lower() on the benched
    # jit reuses jax's cached trace from the measured execution, so the
    # env-gate overrides above would be silently ignored for any function
    # that already ran (round-3/4 symptom: vx counted 7.1 GF/sample when the
    # fused route was live vs 15.56 with it off — the cached Pallas trace,
    # whose custom calls the cost model counts as zero). A fresh jit object
    # has an empty cache, so the trace below runs under the overrides.
    inner = getattr(jitted, "__wrapped__", None)
    if inner is not None:
        jitted = jax.jit(functools.partial(inner))
    saved = {k: os.environ.get(k) for k in overrides}
    os.environ.update(overrides)
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")
        return None
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def compiled_roofline(jitted, *args, **kwargs):
    """BENCH_ROOFLINE=1: bytes-accessed + FLOPs of the MEASURED program
    (live kernel routes, per-sample scans unrolled so every iteration's
    traffic counts) from XLA's cost model → per-step roofline floors.

    Unlike compiled_flops, keeps Pallas routes ON: custom-call operand/
    output bytes approximate the kernels' streaming traffic, while the
    XLA-fallback program would materialize [S, S] attention logits the
    real program never writes. Costs one extra (unrolled) compile."""
    import functools

    import jax

    if isinstance(jitted, functools.partial):
        args = (*jitted.args, *args)
        jitted = jitted.func
    inner = getattr(jitted, "__wrapped__", None)
    if inner is not None:
        jitted = jax.jit(functools.partial(inner))
    saved = os.environ.get("GAOT_FLOPS_UNROLL")
    os.environ["GAOT_FLOPS_UNROLL"] = "1"
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
    except Exception as e:
        log(f"roofline cost_analysis unavailable: {e}")
        return None
    finally:
        if saved is None:
            os.environ.pop("GAOT_FLOPS_UNROLL", None)
        else:
            os.environ["GAOT_FLOPS_UNROLL"] = saved
    kind, peak = device_peak_flops()
    # NOTE: cost-model "bytes accessed" charges every gather op its FULL
    # source array, so for gather-heavy programs it overcounts real HBM
    # traffic — it is reported as a cost-model diagnostic, NOT a memory
    # floor. The binding resource on the vx path is gather descriptor rate
    # (~1 row/cycle); see scripts/vx_descriptor_bound.py.
    out = {"cost_model_bytes_gb": round(nbytes / 1e9, 2),
           "flops_per_step_gf": round(flops / 1e9, 2)}
    if peak:
        out["compute_floor_ms"] = round(flops / peak * 1e3, 2)
    return out


def force(x) -> float:
    """Fetch a scalar VALUE from the last element of x — the only reliable
    execution barrier on the tunneled (axon) TPU runtime; see
    gaot_tpu/utils/timing.py for the measured semantics."""
    from gaot_tpu.utils.timing import force_value

    return force_value(x)


def timed_repeats(run_once, samples_per_rep, repeats):
    """Repeated adjacent measurement blocks → median + min/max spread.

    The round-3 verdict measured 535-1164 samples/s for identical code under
    a single-block harness; every published number now carries its own
    spread so real wins are distinguishable from environment noise.

    Settling pass first: the first timed block after warmup was measured
    20-70% slow EVERY run (residual runtime/dispatch work on the tunneled
    device — fx 868/973 vs 1275, vx 223 vs 301), a systematic warmup
    artifact that a fixed-count warmup folds into the reported spread. Run
    un-timed blocks until two adjacent ones agree within 1% (up to
    BENCH_SETTLE_MAX, default 4) so the timed reps measure steady state.

    run_once must RETURN the final loss array; each rep's timed window ends
    with a forced value fetch of it (see force()) — without the fetch the
    tunneled runtime dispatches lazily and the block measures nothing."""
    assert repeats >= 1, "timed_repeats requires at least one repeat"
    settle_max = int(os.environ.get("BENCH_SETTLE_MAX", 4))
    prev = None
    for i in range(settle_max):
        t0 = time.perf_counter()
        force(run_once())
        rate = samples_per_rep / (time.perf_counter() - t0)
        log(f"  settle {i + 1}/{settle_max}: {rate:.1f} samples/s")
        if prev is not None and abs(rate / prev - 1) < 0.01:
            break
        prev = rate
    rates = []
    last_loss = None
    for i in range(repeats):
        t0 = time.perf_counter()
        last_loss = force(run_once())
        dt = time.perf_counter() - t0
        rates.append(samples_per_rep / dt)
        log(f"  rep {i + 1}/{repeats}: {dt:.3f}s → {rates[-1]:.1f} samples/s"
            f" (loss={last_loss:.4f})")
    srt = sorted(rates)
    return {"value": round(float(np.median(rates)), 2),
            "spread": [round(srt[0], 2), round(srt[-1], 2)],
            "repeats": repeats, "loss": round(last_loss, 4)}


def attach_mfu(out, sps, flops_per_step, batch_size):
    kind, peak = device_peak_flops()
    if flops_per_step:
        tflops_sec = sps * (flops_per_step / batch_size) / 1e12
        out["gflops_per_sample"] = round(flops_per_step / batch_size / 1e9, 2)
        out["tflops_per_sec"] = round(tflops_sec, 2)
        if peak:
            out["mfu"] = round(tflops_sec * 1e12 / peak, 4)
            log(f"device={kind} achieved={tflops_sec:.1f} TF/s "
                f"mfu={out['mfu']:.1%}")
    return out


def warmup_phases(jitted, *args):
    """BENCH_WARMUP_PHASES=1: break the first-dispatch cost into trace /
    compile / execute+fetch via the AOT API (the compile-time budget's
    diagnostic: VERDICT r3 could not tell Mosaic compiles from XLA compiles
    from cache deserialization from trace overhead). Returns phase seconds;
    the caller still warms up through the normal dispatch path afterwards
    (the AOT objects share the persistent compile cache, so the second
    compile is a cache hit and the diagnostic costs ~one extra trace)."""
    import functools

    import jax

    import jax.numpy as jnp

    if isinstance(jitted, functools.partial):
        args = (*jitted.args, *args)
        jitted = jitted.func
    phases = {}
    t0 = time.perf_counter()
    lowered = jitted.lower(*args)
    phases["trace_lower_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    phases["compile_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    # The train steps are jitted with donate_argnums (params/opt_state), and
    # donation survives lower().compile() — executing on the caller's live
    # arrays would invalidate the buffers the subsequent warmup loop reuses
    # ("Array has been deleted"). Run the diagnostic on copies.
    exec_args = jax.tree.map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, args)
    out = compiled(*exec_args)
    force(jax.tree.leaves(out)[-1])
    phases["execute_fetch_s"] = round(time.perf_counter() - t0, 2)
    log(f"warmup phases: {phases}")
    return phases


def run_vx_bench(batch_size, num_nodes, train_size, warmup, iters, repeats,
                 compute_dtype, use_tgraph, use_buckets):
    import jax

    train_step, make_indices, params, opt_state = build_vx_workload(
        batch_size=batch_size, num_nodes=num_nodes, train_size=train_size,
        compute_dtype=compute_dtype, use_tgraph=use_tgraph,
        use_buckets=use_buckets)
    key = jax.random.key(1)
    step_rng = np.random.default_rng(1)
    state = {"params": params, "opt_state": opt_state}
    phases = None
    if os.environ.get("BENCH_WARMUP_PHASES", "0") == "1":
        phases = warmup_phases(train_step, params, opt_state, key,
                               make_indices(step_rng))
    t0 = time.perf_counter()
    for _ in range(warmup):
        state["params"], state["opt_state"], loss = train_step(
            state["params"], state["opt_state"], key, make_indices(step_rng))
    force(loss)  # value fetch: the only real execution barrier (see force())
    warmup_s = time.perf_counter() - t0
    log(f"warmup ({warmup} steps incl. compile): {warmup_s:.2f}s")
    flops_per_step = compiled_flops(train_step, state["params"],
                                    state["opt_state"], key,
                                    make_indices(step_rng))
    roofline = None
    if os.environ.get("BENCH_ROOFLINE", "0") == "1":
        roofline = compiled_roofline(train_step, state["params"],
                                     state["opt_state"], key,
                                     make_indices(step_rng))

    def once():
        for _ in range(iters):
            state["params"], state["opt_state"], loss = train_step(
                state["params"], state["opt_state"], key,
                make_indices(step_rng))
        return loss

    stats = timed_repeats(once, batch_size * iters, repeats)
    out = {"metric": "train_throughput_vx", "unit": "samples/sec/chip",
           "mode": "vx", "nodes": num_nodes,
           "warmup_s": round(warmup_s, 1), **stats}
    if phases:
        out["warmup_phases"] = phases
    if roofline:
        roofline["measured_step_ms"] = round(
            1e3 * batch_size / stats["value"], 2)
        out["roofline"] = roofline
    return attach_mfu(out, stats["value"], flops_per_step, batch_size)


def run_fx_bench(mode, batch_size, num_nodes, warmup, iters, repeats,
                 compute_dtype, attn_backend, use_tgraph, use_buckets):
    import jax

    (train_step, epoch_fn, make_epoch_indices, params, opt_state, pndata,
     target) = build_workload(
        batch_size=batch_size, num_nodes=num_nodes,
        compute_dtype=compute_dtype, attn_backend=attn_backend,
        use_tgraph=use_tgraph, use_buckets=use_buckets,
        with_scan=(mode == "scan"))

    key = jax.random.key(1)
    state = {"params": params, "opt_state": opt_state}
    if mode == "scan":
        # One dispatch per epoch (the trainers' device-resident path); each
        # measurement repeat is one full epoch of k steps.
        host_rng = np.random.default_rng(1)
        k = int(os.environ.get("BENCH_SCAN_STEPS", 32))
        phases = None
        if os.environ.get("BENCH_WARMUP_PHASES", "0") == "1":
            phases = warmup_phases(epoch_fn, params, opt_state, key,
                                   make_epoch_indices(host_rng, k))
        t0 = time.perf_counter()
        state["params"], state["opt_state"], losses = epoch_fn(
            state["params"], state["opt_state"], key,
            make_epoch_indices(host_rng, k))
        # Value fetch: the only real execution barrier on the tunneled
        # runtime (see force()) — block_until_ready returns before the
        # deferred compile even starts.
        force(losses)
        warmup_s = time.perf_counter() - t0
        log(f"warmup (1 epoch of {k} steps incl. compile): {warmup_s:.2f}s")
        # FLOPs from the PER-STEP program: the epoch-scan program's while
        # body is cost-counted once regardless of trip count.
        flops_per_step = compiled_flops(train_step, state["params"],
                                        state["opt_state"], key, pndata,
                                        target)

        def once():
            state["params"], state["opt_state"], losses = epoch_fn(
                state["params"], state["opt_state"], key,
                make_epoch_indices(host_rng, k))
            return losses

        stats = timed_repeats(once, batch_size * k, repeats)
    else:
        phases = None
        t0 = time.perf_counter()
        for _ in range(warmup):
            state["params"], state["opt_state"], loss = train_step(
                state["params"], state["opt_state"], key, pndata, target)
        force(loss)  # value fetch: see force()
        warmup_s = time.perf_counter() - t0
        log(f"warmup ({warmup} steps incl. compile): {warmup_s:.2f}s")
        flops_per_step = compiled_flops(train_step, state["params"],
                                        state["opt_state"], key, pndata,
                                        target)

        def once():
            for _ in range(iters):
                state["params"], state["opt_state"], loss = train_step(
                    state["params"], state["opt_state"], key, pndata, target)
            return loss

        stats = timed_repeats(once, batch_size * iters, repeats)

    out = {
        "metric": "train_throughput",
        "unit": "samples/sec/chip",
        # 'mode' records which training path this run timed (scan =
        # whole-epoch lax.scan, step = one dispatch per step).
        "mode": mode,
        "warmup_s": round(warmup_s, 1),
        **({"warmup_phases": phases} if phases else {}),
        **stats,
    }
    # MFU accounting: FLOPs from XLA's compiled cost model (fwd+bwd+adamw,
    # everything in the dispatched program, per-sample scans unrolled for
    # counting) against the chip's published bf16 dense peak. Gather-heavy
    # models run far below dense peak by construction — report it honestly.
    return attach_mfu(out, stats["value"], flops_per_step, batch_size)


def _with_env(env, fn):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        return fn()
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def run_ablate(mode, run_default):
    """BENCH_ABLATE=1: fused-kernel on/off pairs in ONE process — shared
    build recipe (same seeds → identical graphs/weights), adjacent timing,
    per-setting median+spread. Also asserts the FLOP accounting is
    path-independent (round-3 verdict: 7.1 vs 15.56 GF/sample for the same
    vx math)."""
    if mode == "vx":
        settings = [
            # Attribution chain for the round-5 vx route: default =
            # coordinate-augmented gathers (enc+dec) over in-degree-grouped
            # transpose graphs; aug_off restores the separate f/coords
            # gathers (trace-time, models/agno.py::aug_gather_on);
            # grouped_df_off additionally restores the flat [N, Kt]
            # transpose layout (graph-BUILD time,
            # ops/padding.py::degree_group_tgraph); Morton node ordering
            # on/off (default-on since round 4).
            ("default", {}),
            ("decbucket_off", {"GAOT_VX_MIN_BUCKET_K": "12"}),
            ("aug_off", {"GAOT_VX_MIN_BUCKET_K": "12",
                         "GAOT_AUG_GATHER": "0"}),
            ("grouped_df_off", {"GAOT_VX_MIN_BUCKET_K": "12",
                                "GAOT_AUG_GATHER": "0",
                                "GAOT_GROUPED_DF": "0"}),
            ("morton_off", {"BENCH_MORTON": "0"}),
        ]
    else:
        settings = [
            ("all_fused", {"GAOT_FUSED_FFN": "1",
                           "GAOT_ATTN_BACKEND": "pallas"}),
            ("fused_ffn_off", {"GAOT_FUSED_FFN": "0",
                               "GAOT_ATTN_BACKEND": "pallas"}),
            ("flash_off", {"GAOT_FUSED_FFN": "1",
                           "GAOT_ATTN_BACKEND": "xla"}),
        ]
    results = {}
    for name, env in settings:
        log(f"=== ablate setting: {name} {env} ===")
        results[name] = _with_env(env, run_default)
    # FLOP path-independence holds across KERNEL routes on the SAME graph
    # layout; layout-changing settings (bucketing thresholds, grouped
    # tgraphs, Morton) legitimately change the padded work XLA counts, so
    # the check groups by layout-affecting env keys.
    layout_keys = ("GAOT_VX_MIN_BUCKET_K", "GAOT_GROUPED_DF", "BENCH_MORTON")
    groups = {}
    for (name, env) in settings:
        key = tuple(sorted((k, env[k]) for k in layout_keys if k in env))
        gf = results[name].get("gflops_per_sample")
        if gf:
            groups.setdefault(key, []).append(gf)
    path_independent = all(
        (max(gfs) - min(gfs)) <= 0.01 * max(gfs) for gfs in groups.values())
    if not path_independent:
        log(f"WARNING: FLOP accounting is path-dependent within a layout "
            f"group: {groups}")
    out = {"metric": f"ablate_{mode}", "unit": "samples/sec/chip",
           "flops_path_independent_per_layout": path_independent,
           "results": results}
    print(json.dumps(out))


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", 64))
    num_nodes = int(os.environ.get("BENCH_NODES", 8192))
    warmup = int(os.environ.get("BENCH_WARMUP", 3))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    repeats = int(os.environ.get("BENCH_REPEATS", 5))
    compute_dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    attn_backend = os.environ.get("BENCH_ATTN", "auto")
    use_tgraph = os.environ.get("BENCH_TGRAPH", "1") == "1"
    use_buckets = os.environ.get("BENCH_BUCKETS", "1") == "1"

    import jax

    # Persistent compile cache: repeat runs skip XLA compiles where the
    # backend supports it (always on CPU; best-effort through remote tunnels).
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/gaot_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    log(f"devices: {jax.devices()}")
    log(f"compute dtype: {compute_dtype}, attention backend: {attn_backend}")
    mode = os.environ.get("BENCH_MODE", "scan")  # scan | step | vx

    if mode == "vx":
        def run_default():
            return run_vx_bench(
                batch_size=int(os.environ.get("BENCH_BATCH", 16)),
                num_nodes=num_nodes,
                train_size=int(os.environ.get("BENCH_TRAIN_SIZE", 64)),
                warmup=warmup, iters=iters, repeats=repeats,
                compute_dtype=compute_dtype,
                use_tgraph=use_tgraph, use_buckets=use_buckets)
    else:
        def run_default():
            return run_fx_bench(
                mode, batch_size=batch_size, num_nodes=num_nodes,
                warmup=warmup, iters=iters, repeats=repeats,
                compute_dtype=compute_dtype, attn_backend=attn_backend,
                use_tgraph=use_tgraph, use_buckets=use_buckets)

    if os.environ.get("BENCH_ABLATE", "0") == "1":
        run_ablate(mode, run_default)
        return

    out = run_default()
    vs_baseline = 1.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
    if os.path.exists(base_path) and out["metric"] == "train_throughput":
        with open(base_path) as f:
            base = json.load(f)
        if base.get("value"):
            # Cumulative vs the round-1 initial per-step fp32 implementation.
            vs_baseline = out["value"] / float(base["value"])
    out["vs_baseline"] = round(vs_baseline, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
