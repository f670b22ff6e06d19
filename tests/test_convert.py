"""torch->flax converter tests: synthesize reference-shaped state_dicts,
convert, and check the flax modules accept the result (tree-structure and
shape parity), plus numerical equivalence of a representative layer."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from captra_tpu.training import convert  # noqa: E402
from tests.test_models import tiny_config  # noqa: E402
from captra_tpu.config.schema import NetworkCfg, ObjCfg  # noqa: E402


def _fake_backbone_sd(sd, prefix, pn, in_dim):
    rng = np.random.RandomState(0)

    def conv(key, cin, cout, spatial):
        shape = (cout, cin) + (1,) * spatial
        sd[f"{key}.weight"] = torch.tensor(
            rng.randn(*shape).astype(np.float32))
        sd[f"{key}.bias"] = torch.tensor(rng.randn(cout).astype(np.float32))

    def bn(key, c):
        sd[f"{key}.weight"] = torch.tensor(np.ones(c, np.float32))
        sd[f"{key}.bias"] = torch.tensor(np.zeros(c, np.float32))
        sd[f"{key}.running_mean"] = torch.tensor(
            rng.randn(c).astype(np.float32) * 0.1)
        sd[f"{key}.running_var"] = torch.tensor(
            np.abs(rng.randn(c).astype(np.float32)) + 1.0)

    ch = in_dim + 3
    sa_out = {}
    for name, sa in (("sa1", pn.sa1), ("sa2", pn.sa2)):
        outs = 0
        for i, mlp in enumerate(sa.mlp_list):
            last = ch
            for j, c in enumerate(mlp):
                conv(f"{prefix}.{name}.conv_blocks.{i}.{j}", last, c, 2)
                bn(f"{prefix}.{name}.bn_blocks.{i}.{j}", c)
                last = c
            outs += last
        sa_out[name] = outs
        ch = outs + 3
    last = ch
    for j, c in enumerate(pn.sa3_mlp):
        conv(f"{prefix}.sa3.mlp_convs.{j}", last, c, 2)
        bn(f"{prefix}.sa3.mlp_bns.{j}", c)
        last = c
    fp_in = {"fp3": sa_out["sa2"] + pn.sa3_mlp[-1]}
    last_fp = None
    for fp, mlp in (("fp3", pn.fp3_mlp), ("fp2", pn.fp2_mlp),
                    ("fp1", pn.fp1_mlp)):
        if fp == "fp2":
            cin = sa_out["sa1"] + pn.fp3_mlp[-1]
        elif fp == "fp1":
            cin = in_dim + 3 + pn.fp2_mlp[-1]
        else:
            cin = fp_in["fp3"]
        last = cin
        for j, c in enumerate(mlp):
            conv(f"{prefix}.{fp}.mlp_convs.{j}", last, c, 1)
            bn(f"{prefix}.{fp}.mlp_bns.{j}", c)
            last = c
    conv(f"{prefix}.conv1", pn.fp1_mlp[-1], 32, 1)
    bn(f"{prefix}.bn1", 32)
    return sd


def _struct_equal(a, b, path=""):
    """Same tree structure and leaf shapes."""
    if isinstance(a, dict) or isinstance(b, dict):
        assert isinstance(a, dict) and isinstance(b, dict), path
        assert set(a) == set(b), (path, set(a), set(b))
        for k in a:
            _struct_equal(a[k], b[k], f"{path}/{k}")
    else:
        assert np.shape(a) == np.shape(b), (path, np.shape(a), np.shape(b))


def test_convert_coordnet_structure(key):
    cfg = tiny_config(num_parts=1, extra_dims=1).replace(
        network=NetworkCfg(type="canon_coord", backbone_out_dim=32,
                           nocs_head_dims=(16,)))
    sd = {}
    _fake_backbone_sd(sd, "net.backbone", cfg.pointnet, in_dim=3)
    rng = np.random.RandomState(1)
    sd["net.seg_head.0.weight"] = torch.tensor(
        rng.randn(2, 32, 1).astype(np.float32))
    sd["net.seg_head.0.bias"] = torch.tensor(
        rng.randn(2).astype(np.float32))
    sd["net.nocs_head.0.weight"] = torch.tensor(
        rng.randn(16, 32, 1).astype(np.float32))
    sd["net.nocs_head.0.bias"] = torch.tensor(rng.randn(16).astype(np.float32))
    for k, v in (("weight", np.ones(16)), ("bias", np.zeros(16)),
                 ("running_mean", np.zeros(16)), ("running_var", np.ones(16))):
        sd[f"net.nocs_head.1.{k}"] = torch.tensor(v.astype(np.float32))
    sd["net.nocs_head.3.weight"] = torch.tensor(
        rng.randn(3, 16, 1).astype(np.float32))
    sd["net.nocs_head.3.bias"] = torch.tensor(rng.randn(3).astype(np.float32))

    sd_np = {k: v.numpy() for k, v in sd.items()}
    variables = convert.convert_coordnet(sd_np, cfg)

    from captra_tpu.models.coordnet import CoordNet
    net = CoordNet(cfg)
    ref = net.init(key, jnp.zeros((1, 64, 3)), train=False)
    _struct_equal(jax.tree.map(np.asarray, variables["params"]),
                  jax.tree.map(np.asarray, ref["params"]))
    _struct_equal(jax.tree.map(np.asarray, variables["batch_stats"]),
                  jax.tree.map(np.asarray, ref["batch_stats"]))
    # converted variables must run
    out = net.apply({"params": variables["params"],
                     "batch_stats": variables["batch_stats"]},
                    jnp.zeros((1, 64, 3)) + 0.1, train=False)
    assert np.isfinite(np.asarray(out["nocs"])).all()


def test_convert_rotnet_structure(key):
    cfg = tiny_config(num_parts=2).replace(
        network=NetworkCfg(type="rot", backbone_out_dim=32,
                           nocs_head_dims=(16,)))
    sd = {}
    _fake_backbone_sd(sd, "net.regress_net.encoder", cfg.pointnet, in_dim=0)
    rng = np.random.RandomState(2)
    dims = [32, 512, 512, 256, 6]
    for p in range(2):
        base = f"net.regress_net.pose_pred.rtvec_head.{p}.model"
        seq_idx = 0
        for li in range(4):
            cin, cout = dims[li], dims[li + 1]
            sd[f"{base}.{seq_idx}.weight"] = torch.tensor(
                rng.randn(cout, cin, 1).astype(np.float32))
            sd[f"{base}.{seq_idx}.bias"] = torch.tensor(
                rng.randn(cout).astype(np.float32))
            if li < 3:
                sd[f"{base}.{seq_idx + 1}.weight"] = torch.tensor(
                    np.ones(cout, np.float32))
                sd[f"{base}.{seq_idx + 1}.bias"] = torch.tensor(
                    np.zeros(cout, np.float32))
                seq_idx += 3
            else:
                seq_idx += 1

    sd_np = {k: v.numpy() for k, v in sd.items()}
    variables = convert.convert_rotnet(sd_np, cfg)

    from captra_tpu.models.rotnet import RotNet
    net = RotNet(cfg)
    ref = net.init(key, jnp.zeros((1, 2, 64, 3)),
                   jnp.zeros((1, 64), jnp.int32), train=False)
    _struct_equal(jax.tree.map(np.asarray, variables["params"]),
                  jax.tree.map(np.asarray, ref["params"]))


def test_dense_conversion_numerics(rng):
    """torch Conv1d(k=1) on [B, C, N] == our Dense on [B, N, C] after
    conversion."""
    cin, cout, N = 5, 7, 11
    conv = torch.nn.Conv1d(cin, cout, 1)
    x = rng.randn(2, cin, N).astype(np.float32)
    with torch.no_grad():
        want = conv(torch.tensor(x)).numpy()
    sd = {"layer.weight": conv.weight.detach().numpy(),
          "layer.bias": conv.bias.detach().numpy()}
    d = convert._dense(sd, "layer")
    got = np.swapaxes(x, 1, 2) @ d["kernel"] + d["bias"]
    np.testing.assert_allclose(np.swapaxes(got, 1, 2), want, atol=1e-5)
