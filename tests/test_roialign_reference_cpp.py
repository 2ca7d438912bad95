"""Differential test of ops.roi_align against the REFERENCE's own C++ CPU
implementation (csrc/cpu/ROIAlign_cpu.cpp, the same source the CUDA kernel
mirrors), compiled on the fly as a torch extension.

This is the strongest available oracle for the legacy ROIAlign semantics
(no half-pixel offset, malformed-ROI clamp to 1x1, (i+.5)/S sampling grid,
[-1, size] boundary rule) — previously pinned only by a hand-written numpy
oracle. Also covers nms_cpu for the +1-convention greedy NMS.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow

SRC = "/root/reference/disprcnn/csrc"


@pytest.fixture(scope="module")
def ref_ext(tmp_path_factory):
    from torch.utils import cpp_extension

    build = str(tmp_path_factory.mktemp("refcpp"))
    srcdir = tmp_path_factory.mktemp("src")
    # the reference predates the .data<T>() removal and the
    # .type().is_cuda() deprecation hard-errors; apply a mechanical
    # API-compat patch in the tmpdir so the ORIGINAL algorithm compiles
    # against modern torch headers
    for fname in ("ROIAlign_cpu.cpp", "nms_cpu.cpp"):
        txt = open(f"{SRC}/cpu/{fname}").read()
        txt = txt.replace(".data<", ".data_ptr<")
        txt = txt.replace(".type().is_cuda()", ".is_cuda()")
        txt = txt.replace("dets.type() == scores.type()",
                          "dets.scalar_type() == scores.scalar_type()")
        txt = txt.replace("AT_DISPATCH_FLOATING_TYPES(input.type()",
                          "AT_DISPATCH_FLOATING_TYPES(input.scalar_type()")
        txt = txt.replace("AT_DISPATCH_FLOATING_TYPES(dets.type()",
                          "AT_DISPATCH_FLOATING_TYPES(dets.scalar_type()")
        txt = txt.replace('#include "cpu/vision.h"', '#include "vision.h"')
        (srcdir / fname).write_text(txt)
    vh = open(f"{SRC}/cpu/vision.h").read()
    (srcdir / "vision.h").write_text(vh)
    cpp = srcdir / "binding.cpp"
    cpp.write_text(
        '#include "vision.h"\n'
        "PYBIND11_MODULE(TORCH_EXTENSION_NAME, m) {\n"
        '  m.def("roi_align_forward_cpu", &ROIAlign_forward_cpu);\n'
        '  m.def("nms_cpu", &nms_cpu);\n'
        "}\n"
    )
    try:
        return cpp_extension.load(
            name="ref_csrc_cpu",
            sources=[str(cpp), str(srcdir / "ROIAlign_cpu.cpp"),
                     str(srcdir / "nms_cpu.cpp")],
            extra_include_paths=[str(srcdir)],
            build_directory=build,
            verbose=False,
        )
    except Exception as e:  # no compiler toolchain for torch extensions
        pytest.skip(f"cannot build reference csrc: {e}")


def test_roi_align_matches_reference_cpp(ref_ext):
    from disprcnn_tpu.ops.roi_align import roi_align

    rng = np.random.default_rng(0)
    feat = rng.normal(size=(1, 24, 32, 16)).astype(np.float32)  # NCHW below
    boxes = np.stack([
        rng.uniform(0, 100, 12), rng.uniform(0, 70, 12),
        rng.uniform(0, 120, 12), rng.uniform(0, 90, 12),
    ], axis=1).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + np.abs(boxes[:, 2:] - boxes[:, :2])
    boxes[0] = [10, 10, 10, 10]  # degenerate ROI -> forced 1x1
    rois = np.concatenate([np.zeros((12, 1), np.float32), boxes], axis=1)

    for pooled, sr, scale in ((7, 2, 0.25), (14, 2, 0.125), (5, 1, 1.0)):
        want = ref_ext.roi_align_forward_cpu(
            torch.from_numpy(feat.transpose(0, 3, 1, 2)).contiguous(),
            torch.from_numpy(rois), scale, pooled, pooled, sr,
        ).numpy()
        got = roi_align(jnp.asarray(feat[0]), jnp.asarray(boxes), pooled,
                        spatial_scale=scale, sampling_ratio=sr)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5,
            err_msg=f"pooled={pooled} sr={sr} scale={scale}")


def test_nms_matches_reference_cpp(ref_ext):
    from disprcnn_tpu.ops.nms import nms_mask

    rng = np.random.default_rng(1)
    xy = rng.uniform(0, 200, (64, 2)).astype(np.float32)
    wh = rng.uniform(5, 80, (64, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.uniform(size=64).astype(np.float32)

    for thresh in (0.3, 0.5, 0.7):
        keep_ref = ref_ext.nms_cpu(
            torch.from_numpy(boxes), torch.from_numpy(scores), thresh
        ).numpy()
        keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                   jnp.ones((64,), bool), thresh))
        got_idx = np.nonzero(keep)[0]
        # reference returns kept indices in score order; compare as sets +
        # score ordering
        assert sorted(got_idx) == sorted(keep_ref.tolist()), thresh
