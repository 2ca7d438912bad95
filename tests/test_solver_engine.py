import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from disprcnn_tpu.config import get_default_cfg
from disprcnn_tpu.engine.trainer import TrainState, create_train_state, make_train_step, total_loss
from disprcnn_tpu.solver.build import frozen_path_prefixes, make_optimizer
from disprcnn_tpu.solver.schedules import make_schedule, one_cycle, warmup_multistep


def test_one_cycle_shape():
    s = one_cycle(0.01, 1000)
    lr0 = float(s(0))
    lr_peak = float(s(299))  # 30% of 1000
    lr_end = float(s(999))
    assert abs(lr0 - 0.01 / 25) < 1e-3  # starts at max/div_factor
    assert abs(lr_peak - 0.01) < 1e-4  # peaks at max_lr
    assert lr_end < 1e-5  # anneals to max/(25*1e4)
    # monotone up then down
    ups = [float(s(i)) for i in range(0, 300, 50)]
    downs = [float(s(i)) for i in range(300, 1000, 100)]
    assert all(a <= b + 1e-9 for a, b in zip(ups, ups[1:]))
    assert all(a >= b - 1e-9 for a, b in zip(downs, downs[1:]))


def test_warmup_multistep():
    s = warmup_multistep(0.01, steps=(100, 200), gamma=0.1, warmup_factor=1 / 3,
                         warmup_iters=10)
    assert abs(float(s(0)) - 0.01 / 3) < 1e-6
    assert abs(float(s(10)) - 0.01) < 1e-6
    assert abs(float(s(150)) - 0.001) < 1e-7
    assert abs(float(s(250)) - 0.0001) < 1e-8


def test_frozen_prefixes_from_cfg():
    cfg = get_default_cfg()
    cfg.SOLVER.FIX_BACKBONE = True
    cfg.SOLVER.FIX_DISPARITY = True
    assert frozen_path_prefixes(cfg) == ("backbone", "idispnet")


def test_optimizer_freezing_and_bias_groups():
    cfg = get_default_cfg()
    cfg.SOLVER.OPTIMIZER = "SGD"
    cfg.SOLVER.BIAS_LR_FACTOR = 2
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    params = {
        "backbone": {"conv": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones(3)}},
        "head": {"dense": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones(3)}},
    }
    tx = make_optimizer(cfg, params, lambda s: 0.1, frozen_prefixes=("backbone",))
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen subtree gets exactly zero updates
    assert float(jnp.abs(updates["backbone"]["conv"]["kernel"]).sum()) == 0.0
    assert float(jnp.abs(updates["backbone"]["conv"]["bias"]).sum()) == 0.0
    # bias lr = 2x kernel lr
    ku = float(updates["head"]["dense"]["kernel"][0, 0])
    bu = float(updates["head"]["dense"]["bias"][0])
    assert abs(bu / ku - 2.0) < 1e-5
    assert abs(ku + 0.1) < 1e-6  # lr 0.1 descent


def test_uncertainty_weighted_total_loss():
    losses = {"loss_a": jnp.asarray(2.0), "loss_b": jnp.asarray(4.0)}
    u = jnp.asarray([-1.0, 0.5])
    got = float(total_loss(losses, u))
    import math

    want = (-1.0 + 0.5) + 2.0 * math.exp(1.0) + 4.0 * math.exp(-0.5)
    assert abs(got - want) < 1e-4
    assert float(total_loss(losses, None)) == 6.0


def test_train_step_descends_on_toy_model():
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x=None, y=None, train=False):
            w = self.param("w", nn.initializers.zeros, (4,))
            return {"loss_fit": jnp.sum((w - y) ** 2)}

    model = Toy()
    y = jnp.asarray([1.0, -2.0, 3.0, 0.5])
    variables = model.init(jax.random.PRNGKey(0), y=y)
    tx = optax.sgd(0.1)
    state = create_train_state(model, tx, variables)
    step = make_train_step(model, tx)
    batch = {"y": y}
    losses = []
    for i in range(50):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss_total"]))
    assert losses[-1] < 1e-3 < losses[0]
    assert int(state.step) == 50


def test_train_step_stop_grad_prefixes_freeze_tangents():
    """stop_grad_prefixes must (a) keep frozen subtrees bit-identical and
    (b) keep their tangents symbolically zero — i.e. autodiff never builds a
    backward pass through the frozen branch. (b) is what lets TRAIN_PC run
    with the Pallas cost-volume conv in the frozen iDispNet (no JVP rule).
    Mirrors reference utils/fix_model.py requires_grad_(False)."""
    import flax.linen as nn

    bwd_hits = []

    @jax.custom_vjp
    def trip(x):
        return x

    def trip_fwd(x):
        return x, None

    def trip_bwd(_, g):
        bwd_hits.append(1)
        return (g,)

    trip.defvjp(trip_fwd, trip_bwd)

    class Frozen(nn.Module):
        @nn.compact
        def __call__(self, x):
            w = self.param("w", nn.initializers.ones, (4,))
            return trip(w) * x

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, y=None, train=False):
            a = Frozen(name="idispnet")(y)
            w = self.param("w", nn.initializers.zeros, (4,))
            return {"loss_fit": jnp.sum((w + a - 2.0 * y) ** 2)}

    model = Toy()
    y = jnp.asarray([1.0, -2.0, 3.0, 0.5])
    variables = model.init(jax.random.PRNGKey(0), y=y)
    tx = optax.sgd(0.1)
    state = create_train_state(model, tx, variables)
    step = make_train_step(model, tx, stop_grad_prefixes=("idispnet",))
    w0 = np.asarray(state.params["idispnet"]["w"])
    for _ in range(5):
        state, metrics = step(state, {"y": y}, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(state.params["idispnet"]["w"]), w0)
    assert not bwd_hits, "backward pass was traced through the frozen branch"
    # the trainable head still learns
    assert float(metrics["loss_total"]) < 10.0
    assert not np.allclose(np.asarray(state.params["w"]), 0.0)


def test_merge_predictions_across_hosts_rekey(monkeypatch):
    """merge_predictions_across_hosts stacks per-image dicts, gathers, and
    re-keys by the gathered byte-coded ids (engine/inference.py; reference
    pickle-all_gather semantics at engine/inference.py:253-272). The
    collective is simulated: two hosts' shards concatenated in process order,
    with UNEQUAL shard sizes (other host holds 1 image, padded to 2) and a
    non-numeric image id."""
    import numpy as np

    from disprcnn_tpu.engine import inference as inf

    local0 = {
        "000001": {"box": np.full((2, 4), 1.0), "score": np.asarray([0.9, 0.1])},
        "seq_0003": {"box": np.full((2, 4), 3.0), "score": np.asarray([0.8, 0.2])},
    }
    other = {
        "000002": {"box": np.full((2, 4), 2.0), "score": np.asarray([0.7, 0.3])},
    }

    import jax as _jax

    monkeypatch.setattr(_jax, "process_count", lambda: 2)

    def fake_allgather(stacked):
        if "_dims" in stacked:  # the max-shape agreement round
            return {"_dims": np.concatenate(
                [stacked["_dims"], np.asarray([[1, 6]], np.int64)]
            )}
        nmax, wmax = stacked["_valid"].shape[0], stacked["_imgid"].shape[1]
        oids = sorted(other.keys())
        okeys = [k for k in stacked if not k.startswith("_")]
        ostacked = {}
        for k in okeys:
            a = np.stack([other[i][k] for i in oids])
            pad = np.zeros((nmax - len(oids),) + a.shape[1:], a.dtype)
            ostacked[k] = np.concatenate([a, pad])
        codes = np.zeros((nmax, wmax), np.uint8)
        for r, i in enumerate(oids):
            codes[r, : len(i)] = np.frombuffer(i.encode(), np.uint8)
        ostacked["_imgid"] = codes
        ostacked["_valid"] = np.arange(nmax) < len(oids)
        return {k: np.concatenate([stacked[k], ostacked[k]]) for k in stacked}

    import disprcnn_tpu.parallel.multihost as mh

    monkeypatch.setattr(mh, "all_gather_predictions", fake_allgather)
    merged = inf.merge_predictions_across_hosts(local0)
    assert sorted(merged.keys()) == ["000001", "000002", "seq_0003"]
    np.testing.assert_array_equal(merged["000002"]["box"], np.full((2, 4), 2.0))
    np.testing.assert_array_equal(merged["seq_0003"]["score"], np.asarray([0.8, 0.2]))


def test_loader_aspect_grouping():
    """group_by_aspect partitions each epoch's order into aspect clusters
    (reference grouped_batch_sampler.py semantics) without dropping samples."""
    import numpy as np

    from disprcnn_tpu.data.loader import StereoBatchLoader

    class _DS:
        def __len__(self):
            return 10

        def image_sizes(self):
            # 5 landscape, 5 portrait interleaved
            return [(100, 50) if i % 2 == 0 else (50, 100) for i in range(10)]

        def __getitem__(self, i):
            raise AssertionError("index stream test only")

    ld = StereoBatchLoader(_DS(), 2, (32, 32), shuffle=False, max_iter=5,
                           group_by_aspect=True)
    idxs = []
    it = ld._index_stream()
    for _ in range(10):
        idxs.append(next(it))
    assert sorted(idxs) == list(range(10))
    groups = [i % 2 for i in idxs]
    # one contiguous run per group
    flips = sum(1 for a, b in zip(groups, groups[1:]) if a != b)
    assert flips == 1


def test_train_step_skips_nonfinite_update():
    """A NaN loss must leave params/opt-state untouched and raise the
    skipped_nonfinite counter (reference ALLOW_EXCEPTION skips the iteration,
    engine/trainer.py:116-123)."""
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, y=None, poison=None, train=False):
            w = self.param("w", nn.initializers.zeros, (4,))
            return {"loss_fit": jnp.sum((w - y) ** 2) + poison}

    model = Toy()
    y = jnp.asarray([1.0, -2.0, 3.0, 0.5])
    variables = model.init(jax.random.PRNGKey(0), y=y, poison=jnp.asarray(0.0))
    tx = optax.sgd(0.1, momentum=0.9)
    state = create_train_state(model, tx, variables)
    step = jax.jit(make_train_step(model, tx))

    # one clean step so momentum is non-trivial
    state, m = step(state, {"y": y, "poison": jnp.asarray(0.0)}, jax.random.PRNGKey(0))
    assert float(m["skipped_nonfinite"]) == 0.0
    w_before = np.asarray(state.params["w"])
    mom_before = np.asarray(jax.tree.leaves(state.opt_state)[0])

    state, m = step(state, {"y": y, "poison": jnp.asarray(jnp.nan)}, jax.random.PRNGKey(0))
    assert float(m["skipped_nonfinite"]) == 1.0
    assert not np.isfinite(float(m["loss_total"]))  # still reported to the host log
    np.testing.assert_array_equal(np.asarray(state.params["w"]), w_before)
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state.opt_state)[0]), mom_before)
    assert int(state.step) == 2  # the iteration itself still advances

    # and a following clean step trains normally again
    state, m = step(state, {"y": y, "poison": jnp.asarray(0.0)}, jax.random.PRNGKey(0))
    assert float(m["skipped_nonfinite"]) == 0.0
    assert not np.array_equal(np.asarray(state.params["w"]), w_before)
