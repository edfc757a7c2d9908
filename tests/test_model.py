"""Model-tier tests: module shapes, end_points contract, train/eval modes."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from omni_pq_tpu.models import PQTransformer, Pointnet2Backbone, decoder_prefixes
from tests.util import TINY, tiny_cloud


def test_decoder_prefixes():
    assert decoder_prefixes(6) == [
        "proposal_", "0head_", "1head_", "2head_", "3head_", "4head_", "last_"]


def test_backbone_shapes(rng):
    model = Pointnet2Backbone(width=1, npoints=(128, 64, 32, 16),
                              nsamples=(8, 8, 8, 8))
    pc = jnp.asarray(tiny_cloud(rng))
    variables = model.init(jax.random.PRNGKey(0), pc)
    ep = model.apply(variables, pc)
    assert ep["sa1_xyz"].shape == (2, 128, 3)
    assert ep["sa2_xyz"].shape == (2, 64, 3)
    assert ep["fp2_features"].shape == (2, 64, 288)
    assert ep["seed_inds"].shape == (2, 64)
    assert np.isfinite(np.asarray(ep["fp2_features"])).all()


def test_pq_transformer_forward(rng):
    model = PQTransformer(TINY)
    pc = jnp.asarray(tiny_cloud(rng))
    variables = model.init(jax.random.PRNGKey(0), pc)
    ep = model.apply(variables, pc)

    K, Kq = TINY.num_proposal, TINY.num_quad_proposal
    for prefix in decoder_prefixes(TINY.num_decoder_layers):
        assert ep[f"{prefix}objectness_scores"].shape == (2, K, 2)
        assert ep[f"{prefix}center"].shape == (2, K, 3)
        assert ep[f"{prefix}heading_scores"].shape == (2, K, 1)
        assert ep[f"{prefix}size_scores"].shape == (2, K, 18)
        assert ep[f"{prefix}size_residuals"].shape == (2, K, 18, 3)
        assert ep[f"{prefix}pred_size"].shape == (2, K, 3)
        assert ep[f"{prefix}sem_cls_scores"].shape == (2, K, 18)
        assert ep[f"{prefix}quad_scores"].shape == (2, Kq, 2)
        assert ep[f"{prefix}quad_center"].shape == (2, Kq, 3)
        assert ep[f"{prefix}normal_vector"].shape == (2, Kq, 3)
        assert ep[f"{prefix}quad_size"].shape == (2, Kq, 2)
        assert np.isfinite(np.asarray(ep[f"{prefix}center"])).all()
    # unit normals (per-vector normalization)
    norms = np.linalg.norm(np.asarray(ep["last_normal_vector"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    assert ep["vote_xyz"].shape == (2, 64, 3)
    assert ep["aggregated_vote_xyz"].shape == (2, K, 3)
    assert ep["aggregated_sample_xyz"].shape == (2, Kq, 3)


def test_train_mode_updates_batch_stats(rng):
    model = PQTransformer(TINY)
    pc = jnp.asarray(tiny_cloud(rng))
    variables = model.init(jax.random.PRNGKey(0), pc)
    ep, mutated = model.apply(
        variables, pc, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    assert "batch_stats" in mutated
    # running stats must actually change
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_remat_sa_is_equivalent(rng):
    """remat_sa recomputes the SA MLPs in the backward pass — the param
    tree, forward values, and gradients must be identical to the
    unrematted model (it is a pure scheduling change)."""
    import dataclasses
    model = PQTransformer(TINY)
    model_r = PQTransformer(dataclasses.replace(TINY, remat_sa=True))
    pc = jnp.asarray(tiny_cloud(rng))
    variables = model.init(jax.random.PRNGKey(0), pc)
    variables_r = model_r.init(jax.random.PRNGKey(0), pc)
    # identical param paths + shapes (the lifted remat preserves scope)
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(variables_r)[0]
    assert [(p, a.shape) for p, a in flat] == [(p, a.shape) for p, a in flat_r]

    def loss_fn(m, params):
        ep = m.apply({"params": params,
                      "batch_stats": variables["batch_stats"]}, pc)
        return (jnp.sum(ep["last_center"] ** 2)
                + jnp.sum(ep["last_quad_scores"] ** 2)), ep

    (l0, ep0), g0 = jax.value_and_grad(
        lambda p: loss_fn(model, p), has_aux=True)(variables["params"])
    (l1, ep1), g1 = jax.value_and_grad(
        lambda p: loss_fn(model_r, p), has_aux=True)(variables["params"])
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(ep0["last_center"]),
                                  np.asarray(ep1["last_center"]))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_grads_flow(rng):
    model = PQTransformer(TINY)
    pc = jnp.asarray(tiny_cloud(rng, batch=1))
    variables = model.init(jax.random.PRNGKey(0), pc)

    def loss_fn(params):
        ep = model.apply({"params": params,
                          "batch_stats": variables["batch_stats"]}, pc)
        return jnp.sum(ep["last_center"] ** 2) + jnp.sum(ep["last_quad_scores"] ** 2)

    grads = jax.grad(loss_fn)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # a last_-only loss must reach the backbone, decoder and final heads
    # (earlier per-layer heads legitimately get zero gradient)
    for mod in ["backbone", "decoder_layer1", "prediction_head1",
                "quad_prediction_head1", "vote", "decoder_key_proj"]:
        sub = jax.tree_util.tree_leaves(grads[mod])
        assert any(float(np.abs(np.asarray(g)).sum()) > 0 for g in sub), mod


def test_mha_self_attention_type():
    """attention_type='self' projects (query - attn_output), the reference
    fork's one deviation (multi_head_attention.py:393-396); '' is standard."""
    from omni_pq_tpu.models.transformer import MultiHeadAttention
    q = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 16)),
                    jnp.float32)
    std = MultiHeadAttention(d_model=16, nhead=4, dropout=0.0)
    slf = MultiHeadAttention(d_model=16, nhead=4, dropout=0.0,
                             attention_type="self")
    params = std.init(jax.random.PRNGKey(0), q, q, q)
    out_std = std.apply(params, q, q, q)
    out_slf = slf.apply(params, q, q, q)  # same params: only the wiring moves
    assert out_std.shape == out_slf.shape == q.shape
    # recombine: self-variant equals out_proj applied to (q - pre_proj), so
    # out_self + out_std = out_proj(q) + bias-correction; check via direct form
    w = params["params"]["out_proj"]["kernel"]
    b = params["params"]["out_proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out_slf + out_std),
                               np.asarray(q @ w + 2 * b), rtol=2e-5, atol=2e-5)
