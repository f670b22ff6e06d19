"""URDF parsing + model-info tests on a fake mobility tree."""
import os
from os.path import join as pjoin

import numpy as np

from captra_tpu.data.urdf import generate_instance_info, parse_urdf

URDF = """<?xml version="1.0"?>
<robot name="laptop">
  <link name="base"/>
  <link name="link_0">
    <visual><origin xyz="0.1 0 0"/>
      <geometry><mesh filename="part0.obj"/></geometry></visual>
  </link>
  <link name="link_1">
    <visual><origin xyz="0 0.2 0" rpy="0 0 0"/>
      <geometry><mesh filename="part1.obj"/></geometry></visual>
  </link>
  <joint name="joint_0" type="fixed">
    <parent link="base"/><child link="link_0"/>
  </joint>
  <joint name="joint_1" type="revolute">
    <parent link="link_0"/><child link="link_1"/>
    <origin xyz="0 0 0.05"/><axis xyz="1 0 0"/>
    <limit lower="0" upper="1.5"/>
  </joint>
</robot>
"""

OBJ0 = "v -1 -1 -1\nv 1 1 1\nv 0 0 0\n"
OBJ1 = "v -2 0 0\nv 2 0.5 0.5\n"


def _make_tree(tmp_path):
    d = pjoin(str(tmp_path), "urdf", "laptop", "10101")
    os.makedirs(d)
    with open(pjoin(d, "mobility.urdf"), "w") as f:
        f.write(URDF)
    with open(pjoin(d, "part0.obj"), "w") as f:
        f.write(OBJ0)
    with open(pjoin(d, "part1.obj"), "w") as f:
        f.write(OBJ1)
    return str(tmp_path)


def test_parse_urdf(tmp_path):
    root = _make_tree(tmp_path)
    urdf = parse_urdf(pjoin(root, "urdf", "laptop", "10101"))
    assert urdf["num_links"] == 3
    assert urdf["joint"]["type"] == ["fixed", "revolute"]
    assert urdf["joint"]["parent"] == [0, 1]
    assert urdf["joint"]["axis"][1] == [1, 0, 0]
    assert urdf["joint"]["limit"][1] == [0.0, 1.5]
    assert urdf["link"]["xyz"][1] == [[0.1, 0, 0]]


def test_generate_instance_info(tmp_path):
    root = _make_tree(tmp_path)
    info = generate_instance_info(root, "laptop", "10101")
    assert info["num_parts"] == 2
    assert info["tree"] == [-1, 0]
    assert len(info["corner"]) == 2 and len(info["factor"]) == 2
    # part 0 bbox diag = |(2,2,2)| -> factor 1/sqrt(12)
    np.testing.assert_allclose(info["factor"][0], 1 / np.sqrt(12), rtol=1e-6)
    np.testing.assert_allclose(info["corner"][1][0], [-2, 0, 0])
    # obj2link carries the link origin translation
    np.testing.assert_allclose(info["obj2link"][0][:3, 3], [0.1, 0, 0])
    # compatible with the SAPIEN reader's pose chain
    from captra_tpu.data.sapien import base_generate_data
    rng = np.random.RandomState(0)
    out = base_generate_data(info, rng.randn(50, 3).astype(np.float32),
                             rng.randint(0, 2, 50), np.eye(4),
                             {0: np.eye(4), 1: np.eye(4)})
    assert len(out["nocs2camera"]) == 2
