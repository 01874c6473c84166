"""YAML config loading + torch->flax weight conversion tests."""
import numpy as np
import pytest

from slide_slam_tpu.io.config_yaml import (dump_slam_config, load_class_info,
                                           load_slam_config)


def test_slam_config_roundtrip(tmp_path):
    yaml_text = """
sloam:
  use_slidematch: true
  communication_wait_time: 7.5
  cylinder_match_thresh: 2.5
  number_of_robots: 4
  place_recognition:
    search_xy_step_size: 0.2
    min_num_inliers: 12
  place_recognition_slidegraph:
    sigma: 0.05
  factor_graph:
    noise_model_odom_vec: [0.2, 0.2, 0.2, 0.1, 0.1, 0.1]
  capacity:
    max_poses_per_robot: 256
  solver:
    pcg_max_iterations: 64
"""
    p = tmp_path / "sloam.yaml"
    p.write_text(yaml_text)
    cfg = load_slam_config(str(p))
    assert cfg.use_slidematch is True
    assert cfg.communication_wait_time == 7.5
    assert cfg.cylinder_match_thresh == 2.5
    assert cfg.number_of_robots == 4
    assert cfg.place_recognition.search_xy_step_size == 0.2
    assert cfg.place_recognition.min_num_inliers == 12
    assert cfg.slidegraph.sigma == 0.05
    assert cfg.noise.odom == (0.2, 0.2, 0.2, 0.1, 0.1, 0.1)
    assert cfg.capacity.max_poses_per_robot == 256
    assert cfg.solver.pcg_max_iterations == 64

    # round trip
    p2 = tmp_path / "dump.yaml"
    p2.write_text(dump_slam_config(cfg))
    cfg2 = load_slam_config(str(p2))
    assert cfg2 == cfg


def test_class_info_yaml(tmp_path):
    p = tmp_path / "classes.yaml"
    p.write_text("""
classes:
  car:
    id: 5
    model: cuboid
    dim_lo: [2.0, 1.0, 0.8]
    dim_hi: [7.0, 3.0, 2.5]
  tree:
    id: 8
    model: cylinder
    eps_cluster: 0.8
pipeline:
  max_range: 25.0
""")
    cfg = load_class_info(str(p))
    assert cfg.max_range == 25.0
    by_name = {c.name: c for c in cfg.classes}
    assert by_name["car"].label == 5 and by_name["car"].dim_lo == (2.0, 1.0, 0.8)
    assert by_name["tree"].model == "cylinder"


def test_torch_weight_conversion():
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from slide_slam_tpu.frontend import segmentation as seg
    from slide_slam_tpu.frontend.torch_convert import (
        load_torch_weights_into_flax)

    model = seg.small_segmentator(num_classes=4)
    variables = seg.init_params(model, jax.random.PRNGKey(0), height=8,
                                width=64)

    # build a torch state_dict with conv/bn pairs matching the flax tree's
    # leading layers (first ConvBNLeaky: 5 -> 32, 3x3)
    sd = {
        "backbone.conv1.weight": torch.randn(32, 5, 3, 3),
        "backbone.bn1.weight": torch.randn(32),
        "backbone.bn1.bias": torch.randn(32),
        "backbone.bn1.running_mean": torch.randn(32),
        "backbone.bn1.running_var": torch.rand(32) + 0.5,
    }
    sd = {k: v.numpy() for k, v in sd.items()}
    new_vars, n_loaded = load_torch_weights_into_flax(variables, sd)
    assert n_loaded == 1
    # converted kernel matches with OIHW->HWIO transpose (locate the first
    # ConvBNLeaky pair the same way the converter does)
    from slide_slam_tpu.frontend.torch_convert import _flax_conv_bn_paths, _get
    conv_path, _bn_path = _flax_conv_bn_paths(new_vars["params"])[0]
    got = _get(new_vars["params"], conv_path)["kernel"]
    want = np.transpose(sd["backbone.conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # network still runs
    labels = seg.segment(model, jax.tree_util.tree_map(jnp.asarray, new_vars),
                         jnp.zeros((1, 8, 64, 5)))
    assert labels.shape == (1, 8, 64)
