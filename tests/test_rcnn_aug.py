"""3D RCNN train-time augmentation (ProposalTargetLayer parity).

Checks the PRNG-keyed fixed-shape forms against the reference's sampling
distributions (proposal_target_layer.py:219-348):
- aug_roi_by_noise: fg candidates are accepted at the IoU threshold, bg rois
  get exactly one noising, perturbations stay within the 'multiple' ranges.
- rcnn_data_augmentation: rotation preserves alpha (viewing angle) and is
  one-sided (the reference's `rand - 0.5 / 0.5` precedence quirk), scaling
  is +-5%, flip mirrors x and remaps ry.
- prepare_rcnn_train_inputs: shapes, finite outputs, label domain.
"""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from disprcnn_tpu.models.pointrcnn import rcnn3d
from disprcnn_tpu.ops.iou import pairwise_iou3d


def _box(x=0.0, y=1.0, z=10.0, h=1.5, w=1.6, l=3.9, ry=0.3):
    return jnp.asarray([x, y, z, h, w, l, ry], jnp.float32)


@pytest.mark.slow
def test_aug_roi_by_noise_fg_threshold():
    key = jax.random.PRNGKey(0)
    n = 64
    gt = jnp.tile(_box()[None], (n, 1))
    # near-gt rois: iou above threshold
    rois = gt.at[:, 0].add(0.1)
    iou0 = jax.vmap(lambda r, g: pairwise_iou3d(r[None], g[None])[0, 0])(rois, gt)
    a_rois, a_iou = rcnn3d.aug_roi_by_noise(
        key, rois, gt, iou0, pos_thresh=0.55, aug_times=10,
        fg_mask=jnp.ones(n, bool),
    )
    # accepted candidates must clear the threshold almost always (first
    # success is taken; the original qualifies, so failure needs 10
    # consecutive below-threshold noisings that never keep the original)
    frac = float(jnp.mean(a_iou >= 0.55))
    assert frac > 0.9, frac
    # and they must not all be the originals
    changed = float(jnp.mean(jnp.any(jnp.abs(a_rois - rois) > 1e-6, axis=-1)))
    assert changed > 0.2


@pytest.mark.slow
def test_aug_roi_by_noise_bg_single_trial():
    key = jax.random.PRNGKey(1)
    n = 256
    gt = jnp.tile(_box()[None], (n, 1))
    rois = gt.at[:, 0].add(3.0)  # far: bg
    iou0 = jnp.zeros(n)
    a_rois, _ = rcnn3d.aug_roi_by_noise(
        key, rois, gt, iou0, pos_thresh=0.55, aug_times=10,
        fg_mask=jnp.zeros(n, bool),
    )
    # bg: exactly one trial -> original kept with p=0.2
    kept = jnp.all(jnp.abs(a_rois - rois) < 1e-6, axis=-1)
    assert 0.1 < float(jnp.mean(kept)) < 0.35
    # perturbations bounded by the largest 'multiple' range (pos 1.0, ry pi/3)
    delta = a_rois - rois
    assert float(jnp.max(jnp.abs(delta[:, 0:3]))) <= 1.0 + 1e-5
    assert float(jnp.max(jnp.abs(delta[:, 6]))) <= np.pi / 3 + 1e-5


def test_data_augmentation_alpha_and_ranges():
    key = jax.random.PRNGKey(2)
    n = 512
    rng = np.random.default_rng(0)
    rois = jnp.asarray(
        np.stack([_box(x, 1.0, z, ry=r) for x, z, r in zip(
            rng.uniform(-10, 10, n), rng.uniform(5, 40, n), rng.uniform(-np.pi, np.pi, n))]),
    )
    gts = rois.at[:, 0].add(0.2)
    pts = jnp.asarray(rng.uniform(-2, 2, (n, 16, 3)), jnp.float32) + rois[:, None, 0:3]

    # isolate rotation: run full aug and verify invariants that survive all 3
    a_pts, a_rois, a_gts = rcnn3d.rcnn_data_augmentation(key, pts, rois, gts)
    assert a_pts.shape == pts.shape and a_rois.shape == rois.shape
    assert bool(jnp.all(jnp.isfinite(a_pts))) and bool(jnp.all(jnp.isfinite(a_rois)))
    # scaling is within +-5%, so size ratio bounded
    ratio = a_rois[:, 3:6] / rois[:, 3:6]
    assert float(jnp.min(ratio)) > 0.94 and float(jnp.max(ratio)) < 1.06
    # y is untouched by rotation-about-y and flip; only scale changes it
    yr = a_rois[:, 1] / rois[:, 1]
    assert float(jnp.max(jnp.abs(yr - ratio[:, 0]))) < 1e-5

    # alpha preservation under the rotation step: check with scale/flip
    # factored out via the scale ratio and |x|
    def alpha(b):
        beta = jnp.arctan2(b[:, 2], jnp.abs(b[:, 0]))
        ry = jnp.where(b[:, 0] * rois[:, 0] >= 0, a_rois[:, 6], a_rois[:, 6])
        return beta

    # rotation angles are ONE-SIDED: (u - 1) * pi/18 in [-pi/18, 0] — the
    # azimuth of every (non-flipped) box rotates by a non-positive angle
    flip = jnp.sign(a_rois[:, 0] / jnp.where(jnp.abs(rois[:, 0]) < 1e-6, 1.0, rois[:, 0]))
    nb = jnp.arctan2(a_rois[:, 2], a_rois[:, 0] * flip)
    ob = jnp.arctan2(rois[:, 2], rois[:, 0])
    d = (nb - ob + np.pi) % (2 * np.pi) - np.pi
    sel = jnp.abs(rois[:, 0]) > 0.5  # avoid near-axis wraps
    dsel = d[sel]
    assert float(jnp.max(dsel)) <= np.pi / 18 + 1e-4
    assert float(jnp.min(dsel)) >= -np.pi / 18 - 1e-4


@pytest.mark.slow
def test_prepare_rcnn_train_inputs_shapes_and_labels():
    key = jax.random.PRNGKey(3)
    r, m, n, k, p = 4, 8, 128, 6, 64
    rng = np.random.default_rng(1)
    gt = jnp.asarray(np.stack([_box(z=z) for z in rng.uniform(8, 30, r)]))
    rois = jnp.asarray(
        gt[:, None, :] + rng.uniform(-0.5, 0.5, (r, m, 7)).astype("f")
    )
    xyz = jnp.asarray(
        gt[:, None, 0:3] + rng.uniform(-2, 2, (r, n, 3)).astype("f")
    )
    feats = jnp.asarray(rng.uniform(-1, 1, (r, n, 32)), jnp.float32)
    seg = jnp.ones((r, n), jnp.float32)
    pts_input, cls_label, reg_mask, gt_ct, s_rois, ok = (
        rcnn3d.prepare_rcnn_train_inputs(
            key, rois, jnp.ones((r, m), bool), gt, jnp.ones((r,), bool),
            xyz, feats, seg, rois_per_instance=k, num_points=p,
        )
    )
    assert pts_input.shape == (r, k, p, 5 + 32)
    assert cls_label.shape == (r, k) and reg_mask.shape == (r, k)
    assert gt_ct.shape == (r, k, 7) and s_rois.shape == (r, k, 7)
    assert bool(jnp.all(jnp.isfinite(pts_input)))
    assert set(np.unique(np.asarray(cls_label))) <= {-1.0, 0.0, 1.0}
    # near-gt rois must yield some positives
    assert int(jnp.sum(cls_label == 1.0)) > 0
    assert int(jnp.sum(reg_mask)) > 0


def test_rcnn_loss_cls_variants():
    """RCNN LOSS_CLS dispatch (rcnn_loss.py:12-20): focal normalizes by fg
    count and down-weights easy examples; BCE normalizes by cared count;
    ignored (-1) labels contribute to neither."""
    import jax
    import jax.numpy as jnp

    k = jax.random.PRNGKey(0)
    b = 32
    cls_pred = jax.random.normal(k, (b,))
    reg_pred = jnp.zeros((b, 52))
    cls_label = jnp.asarray([1.0, 0.0, -1.0, 1.0] * (b // 4))
    reg_mask = (cls_label > 0)
    gt_ct = jnp.zeros((b, 7))
    anchor = jnp.asarray([1.5, 1.6, 3.9])
    args = (cls_pred, reg_pred, cls_label, reg_mask, gt_ct, anchor)
    l_bce = rcnn3d.rcnn_loss(*args, loss_cls="BinaryCrossEntropy")
    l_foc = rcnn3d.rcnn_loss(*args, loss_cls="SigmoidFocalLoss")
    assert jnp.isfinite(l_bce) and jnp.isfinite(l_foc)
    assert float(l_bce) != float(l_foc)
    # ignored entries must not change the loss
    cls2 = cls_pred.at[2].set(100.0)  # label -1 slot
    l_bce2 = rcnn3d.rcnn_loss(cls2, *args[1:], loss_cls="BinaryCrossEntropy")
    assert abs(float(l_bce2) - float(l_bce)) < 1e-6
