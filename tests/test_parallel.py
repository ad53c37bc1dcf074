"""Parallelism tests on the 8-virtual-CPU-device mesh: data-parallel
equivalence, tensor-parallel param sharding, full multichip dry run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gaot_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
    make_mesh as _mm,
)


def test_make_mesh_shapes():
    mesh = make_mesh(-1, 1)
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = make_mesh(4, 2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    mesh = make_mesh(2, 2)  # uses a subset of devices
    assert mesh.shape["data"] == 2


def test_shard_batch_places_batch_axis():
    mesh = make_mesh(4, 1)
    batch = {"u": np.zeros((8, 16, 2), np.float32),
             "graph": np.zeros((100, 4), np.int32)}
    placed = shard_batch(batch, mesh, batch_size=8)
    assert placed["u"].sharding.spec == P("data")
    assert placed["graph"].sharding.spec == P()


def test_param_specs_tp_rules():
    params = {
        "params": {
            "processor": {"encoder_0": {"attn": {
                "q_proj": {"kernel": np.zeros((32, 32), np.float32)},
                "o_proj": {"kernel": np.zeros((32, 32), np.float32)},
            }, "ffn": {
                "w1": {"kernel": np.zeros((32, 128), np.float32)},
                "w2": {"kernel": np.zeros((128, 32), np.float32)},
            }}},
            "encoder": {"lifting": {"dense_0": {"kernel": np.zeros((3, 8), np.float32)}}},
        }
    }
    specs = param_specs(params, model_parallel=True)
    p = specs["params"]["processor"]["encoder_0"]
    assert p["attn"]["q_proj"]["kernel"] == P(None, "model")
    assert p["attn"]["o_proj"]["kernel"] == P("model", None)
    assert p["ffn"]["w1"]["kernel"] == P(None, "model")
    assert p["ffn"]["w2"]["kernel"] == P("model", None)
    assert specs["params"]["encoder"]["lifting"]["dense_0"]["kernel"] == P()


def test_data_parallel_loss_matches_single_device():
    """A jitted masked-MSE grad step must give identical results whether the
    batch lives on 1 device or is sharded across 8."""
    from gaot_tpu.train.static_trainer import masked_mse

    rng = np.random.default_rng(0)
    pred_fn = lambda w, x: x @ w
    w = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
    x = rng.normal(size=(8, 16, 4)).astype(np.float32)
    y = rng.normal(size=(8, 16, 2)).astype(np.float32)
    mask = np.ones(8, bool)

    def loss(w, x, y, m):
        return masked_mse(pred_fn(w, x), y, m)

    g_single = jax.grad(loss)(w, jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask))

    mesh = make_mesh(8, 1)
    placed = shard_batch({"x": x, "y": y, "mask": mask}, mesh, 8)
    g_sharded = jax.jit(jax.grad(loss))(w, placed["x"], placed["y"], placed["mask"])
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tp_forward_matches_replicated():
    """Tensor-parallel transformer forward must equal the replicated one."""
    import __graft_entry__ as ge

    model, params, latent_j, coords_j, pndata, enc, dec = ge._build(batch_size=4)
    out_ref = model.apply(params, latent_j, coords_j, pndata, enc, dec)

    mesh = make_mesh(4, 2)
    params_tp = shard_params(params, mesh)
    placed = shard_batch({"pndata": np.asarray(pndata)}, mesh, 4)
    out_tp = jax.jit(lambda p, x: model.apply(p, latent_j, coords_j, x, enc, dec))(
        params_tp, placed["pndata"])
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_tp),
                               rtol=2e-4, atol=1e-5)


def test_flat_df_scan_under_dp_sharding():
    """The per-sample-slab backward scan (ops/gather_apply.py::_flat_df_scan)
    iterates over the GLOBAL sample axis; under data-parallel batch sharding
    XLA must still produce gradients identical to the unsharded run (it may
    all-gather the scanned operands — correctness first, the scan's VMEM win
    is a single-device property)."""
    import jax.numpy as jnp

    from gaot_tpu.models.magno import flatten_vx_graph, flatten_vx_tgraph
    from gaot_tpu.ops.gather_apply import gather_multiply_reduce
    from gaot_tpu.ops.neighbor_search import radius_search
    from gaot_tpu.ops.padding import (
        PaddedGraph,
        TransposeGraph,
        pad_csr,
        repad,
        repad_tgraph,
        stack_graphs,
        transpose_graph,
    )

    rng = np.random.default_rng(11)
    b, n, q, c = 8, 24, 12, 8
    srcs = rng.uniform(-1, 1, (b, n, 2))
    dst = rng.uniform(-1, 1, (q, 2))
    gs = [pad_csr(*radius_search(srcs[i], dst, 0.6), pad_multiple=4)
          for i in range(b)]
    k = max(g.k for g in gs)
    gs = [repad(g, k) for g in gs]
    ts = [repad_tgraph(transpose_graph(g, n), 8) for g in gs]
    stacked = stack_graphs(gs)
    flat_g = flatten_vx_graph(
        PaddedGraph(jnp.asarray(stacked.indices), jnp.asarray(stacked.mask)), n)
    flat_t = flatten_vx_tgraph(
        TransposeGraph(jnp.asarray(np.stack([t.edge_pos for t in ts])),
                       jnp.asarray(np.stack([t.query for t in ts])),
                       jnp.asarray(np.stack([t.mask for t in ts]))), q, k)
    coef = jnp.asarray(rng.normal(size=(b * q, k, c)).astype(np.float32))
    coef = coef * flat_g.mask[..., None]
    f = rng.normal(size=(b * n, c)).astype(np.float32)

    def loss(coef, f):
        return jnp.sum(gather_multiply_reduce(
            coef, f, flat_g.indices, flat_t.edge_pos, flat_t.query,
            flat_t.mask, b) ** 2)

    gc0, gf0 = jax.grad(loss, argnums=(0, 1))(coef, jnp.asarray(f))

    mesh = make_mesh(8, 1)
    placed = shard_batch(
        {"f": f.reshape(b, n, c)}, mesh, b)
    f_sh = placed["f"].reshape(b * n, c)
    gc1, gf1 = jax.jit(jax.grad(loss, argnums=(0, 1)))(coef, f_sh)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc1), np.asarray(gc0),
                               rtol=1e-5, atol=1e-6)
