"""Capture a jax.profiler trace of the vx train step and print the top HLO
ops by self-time (parsed via the installed xprof/tensorboard_plugin_profile
converter — no TensorBoard UI needed).

Usage: python scripts/trace_vx.py [dense|bucketed] [batch] [nodes] [samples]
"""
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def capture(layout="bucketed", batch_size=16, num_nodes=8192, train_size=16,
            trace_dir="/tmp/vx_trace"):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gaot_jax_cache")
    os.environ["BENCH_BUCKETS"] = "1" if layout == "bucketed" else "0"
    import bench
    import numpy as np

    key = jax.random.key(1)
    rng = np.random.default_rng(1)
    if layout == "fx":
        # The fx flagship per-step path (bench.py default workload, scan off).
        (train_step, _, _, params, opt_state, pndata,
         target) = bench.build_workload(
            batch_size=batch_size, num_nodes=num_nodes,
            use_tgraph=True, use_buckets=True, with_scan=False)
        args = (pndata, target)

        def step(params, opt_state):
            return train_step(params, opt_state, key, *args)
    else:
        train_step, make_indices, params, opt_state = bench.build_vx_workload(
            batch_size=batch_size, num_nodes=num_nodes, train_size=train_size,
            use_buckets=(layout == "bucketed"))

        def step(params, opt_state):
            return train_step(params, opt_state, key, make_indices(rng))

    from gaot_tpu.utils.timing import force_value

    for _ in range(2):
        params, opt_state, loss = step(params, opt_state)
    # Value fetch, not block_until_ready: the tunneled runtime defers
    # compile+execution until a value is fetched (utils/timing.py) — a
    # lazily-dispatched loop would profile as an empty trace.
    force_value(loss)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state)
        force_value(loss)
    return trace_dir


def report(trace_dir, top=35):
    try:
        from xprof.convert import raw_to_tool_data
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

    sessions = sorted(glob.glob(os.path.join(trace_dir, "plugins", "profile",
                                             "*")))
    assert sessions, f"no profile session under {trace_dir}"
    # Only the LATEST session: feeding xplanes from several sessions makes
    # the converter return None.
    xplanes = glob.glob(os.path.join(sessions[-1], "*.xplane.pb"))
    assert xplanes, f"no xplane under {sessions[-1]}"
    data = raw_to_tool_data.xspace_to_tool_data(xplanes, "hlo_stats", {})
    payload = data[0] if isinstance(data, tuple) else data
    obj = json.loads(payload)
    # hlo_stats is a GViz table: {cols: [...], rows: [{c: [{v: ...}]}]}
    cols = [c["label"] for c in obj["cols"]]
    rows = [[cell.get("v") if cell else None for cell in r["c"]]
            for r in obj["rows"]]
    i_time = next(i for i, c in enumerate(cols) if "total self time (us)" in c.lower())
    i_cat = next(i for i, c in enumerate(cols) if "category" in c.lower())
    i_name = next((i for i, c in enumerate(cols) if "hlo op expression" in c.lower()),
                  next(i for i, c in enumerate(cols) if "name" in c.lower()))
    rows.sort(key=lambda r: -(r[i_time] or 0))
    total = sum(r[i_time] or 0 for r in rows)
    print(f"total self time: {total / 1e3:.2f} ms (3 steps)")
    by_cat = {}
    for r in rows:
        by_cat[r[i_cat]] = by_cat.get(r[i_cat], 0) + (r[i_time] or 0)
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:28s} {t / 1e3:9.2f} ms  {100 * t / total:5.1f}%")
    i_expr = next((i for i, c in enumerate(cols)
                   if "expression" in c.lower() and i != i_name), None)
    print("\ntop ops:")
    for r in rows[:top]:
        name = str(r[i_name])[:110]
        expr = str(r[i_expr])[:240] if i_expr is not None else ""
        print(f"  {(r[i_time] or 0) / 1e3:8.2f} ms  {r[i_cat]:<22s} {name}")
        if expr and expr != name:
            print(f"             {expr}")


if __name__ == "__main__":
    layout = sys.argv[1] if len(sys.argv) > 1 else "bucketed"
    args = [int(a) for a in sys.argv[2:5]]
    d = capture(layout, *args)
    report(d)
