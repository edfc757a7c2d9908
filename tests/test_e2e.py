"""End-to-end learning test: overfitting a handful of synthetic rooms must
move the model measurably toward the ground truth — the whole loop (data ->
kernels -> model -> losses -> optimizer) has to cooperate for this to pass."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omni_pq_tpu.config import SCANNET_MEAN_SIZES
from omni_pq_tpu.data.synthetic import make_batch
from omni_pq_tpu.models import PQTransformer
from omni_pq_tpu.ops import nn_distance
from omni_pq_tpu.train import (TrainFlags, OptimizerConfig, create_train_state,
                               make_train_step, make_eval_step)
from tests.util import TINY


@pytest.mark.slow
def test_overfit_improves_quads():
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v)
             for k, v in make_batch(rng, 2, TINY.num_points, num_objects=3).items()}
    model = PQTransformer(TINY)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch["point_clouds"])
    state = create_train_state(
        variables, OptimizerConfig(total_steps=200, learning_rate=2e-3),
        ema=True)
    flags = TrainFlags(ema=False, gamma_mixture=False, arkit=False,
                       pc_loss=False)
    step = make_train_step(model, TINY, SCANNET_MEAN_SIZES, flags)
    ev = make_eval_step(model)

    key = jax.random.PRNGKey(1)
    hist = {"total_loss": [], "vote_loss": [], "objectness_loss": []}
    for i in range(40):
        key, k = jax.random.split(key)
        state, stats = step(state, batch, batch, k, jnp.float32(0.0))
        for key_ in hist:
            hist[key_].append(float(stats[key_]))

    for k_, v_ in hist.items():
        assert all(np.isfinite(v_)), k_
    # total loss must fall substantially when overfitting a fixed tiny batch
    assert np.mean(hist["total_loss"][-5:]) < 0.7 * np.mean(hist["total_loss"][:5])
    # the dense supervision paths must individually improve (at this tiny
    # scale the 0.3m quad/object assignment radius yields no positives — the
    # same sparse-assignment behavior the reference has — so geometric
    # improvement is only observable at full scale)
    assert np.mean(hist["vote_loss"][-5:]) < np.mean(hist["vote_loss"][:5])
    assert np.mean(hist["objectness_loss"][-5:]) < np.mean(hist["objectness_loss"][:5])
    # the eval path still runs on the trained weights
    ep1 = ev(state, batch["point_clouds"])
    assert np.isfinite(np.asarray(ep1["last_quad_center"])).all()
