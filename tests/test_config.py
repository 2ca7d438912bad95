import pytest

from disprcnn_tpu.config import get_default_cfg


def test_defaults_tree():
    cfg = get_default_cfg()
    assert cfg.MODEL.META_ARCHITECTURE == "GeneralizedRCNN"
    assert cfg.MODEL.RPN.ANCHOR_SIZES == (32, 64, 128, 256, 512)
    assert cfg.MODEL.POINTRCNN.RPN.NPOINTS == 768
    assert cfg.SOLVER.IMS_PER_BATCH == 16
    assert cfg.MODEL.DISPNET.MIN_DISP == -48


def test_merge_from_list_and_freeze():
    cfg = get_default_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.02", "MODEL.STEREO_ON", "True"])
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.MODEL.STEREO_ON is True
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0


def test_merge_from_yaml(tmp_path):
    f = tmp_path / "exp.yaml"
    f.write_text(
        "MODEL:\n  STEREO_ON: true\n  RPN:\n    NMS_THRESH: 0.6\nSOLVER:\n  MAX_ITER: 123\n"
    )
    cfg = get_default_cfg()
    cfg.merge_from_file(str(f))
    assert cfg.MODEL.STEREO_ON is True
    assert cfg.MODEL.RPN.NMS_THRESH == 0.6
    assert cfg.SOLVER.MAX_ITER == 123


def test_unknown_key_rejected(tmp_path):
    f = tmp_path / "bad.yaml"
    f.write_text("MODEL:\n  NO_SUCH_KEY: 1\n")
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(f))


def test_reference_yaml_configs_merge():
    """The reference's shipped experiment YAMLs must merge cleanly (public API parity)."""
    import glob

    files = sorted(glob.glob("/root/reference/configs/kitti/**/*.yaml", recursive=True))
    assert files, "reference configs missing"
    for path in files:
        cfg = get_default_cfg()
        cfg.merge_from_file(path)
