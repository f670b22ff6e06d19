"""Reference (PyTorch) checkpoint -> flax variables converter.

The reference releases pretrained checkpoints as torch `.pt`/`.tar` files
holding {epoch, iteration, model: state_dict, optimizer} (reference
trainer.py:196-210).  This maps those state_dicts onto our flax trees for
the accuracy-parity gate (BASELINE.json configs[0]).

Key layout (reference module structure):
  CoordNet ckpt:  net.backbone.* / net.seg_head.* / net.nocs_head.*
                  (networks.py:19-32, backbones.py:15-53)
  RotationNet:    net.regress_net.encoder.* /
                  net.regress_net.pose_pred.rtvec_head.{p}.model.*
                  (networks.py:113-121, blocks.py:168-179)

Weight-shape conventions: torch 1x1 Conv1d/Conv2d weights are
[Cout, Cin, 1(, 1)] -> our Dense kernels are [Cin, Cout]; BN running stats
map to flax batch_stats; the P rotation heads stack into the leading axis of
our nn.vmap'ed head parameters.
"""
from __future__ import annotations

import numpy as np

from captra_tpu.config.schema import Config, PointNetCfg


def load_torch_state_dict(path: str) -> dict:
    """Load a reference checkpoint's model state_dict as numpy arrays."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return {k: v.detach().numpy() for k, v in sd.items()}


def _dense(sd, key):
    w = np.asarray(sd[f"{key}.weight"])
    w = w.reshape(w.shape[0], w.shape[1])  # drop 1x1 conv spatial dims
    return {"kernel": w.T.astype(np.float32),
            "bias": np.asarray(sd[f"{key}.bias"], np.float32)}


def _norm(sd, key):
    return ({"scale": np.asarray(sd[f"{key}.weight"], np.float32),
             "bias": np.asarray(sd[f"{key}.bias"], np.float32)},
            {"mean": np.asarray(sd.get(f"{key}.running_mean", 0.0),
                                np.float32),
             "var": np.asarray(sd.get(f"{key}.running_var", 1.0),
                               np.float32)})


def _point_mlp(sd, conv_keys, norm_keys):
    """Build one PointMLP params/stats pair from torch layer keys (None in
    norm_keys = no norm for that layer)."""
    params, stats = {}, {}
    for j, ck in enumerate(conv_keys):
        params[f"dense_{j}"] = _dense(sd, ck)
    for j, nk in enumerate(norm_keys):
        if nk is None:
            continue
        p, s = _norm(sd, nk)
        params[f"norm_{j}"] = p
        if f"{nk}.running_mean" in sd:
            stats[f"norm_{j}"] = s
    return params, stats


def convert_backbone(sd: dict, prefix: str, pn: PointNetCfg):
    """Torch PointNet2Msg state_dict subtree -> (params, batch_stats)."""
    params, stats = {}, {}

    for name, sa in (("sa1", pn.sa1), ("sa2", pn.sa2)):
        p_sa, s_sa = {}, {}
        for i, mlp in enumerate(sa.mlp_list):
            convs = [f"{prefix}.{name}.conv_blocks.{i}.{j}"
                     for j in range(len(mlp))]
            norms = [f"{prefix}.{name}.bn_blocks.{i}.{j}"
                     for j in range(len(mlp))]
            p, s = _point_mlp(sd, convs, norms)
            p_sa[f"scale_{i}"] = p
            s_sa[f"scale_{i}"] = s
        params[name] = p_sa
        stats[name] = s_sa

    def seq(name, mlp_len, conv_fmt, norm_fmt):
        convs = [conv_fmt.format(j) for j in range(mlp_len)]
        norms = [norm_fmt.format(j) for j in range(mlp_len)]
        p, s = _point_mlp(sd, convs, norms)
        params[name] = {"mlp": p}
        stats[name] = {"mlp": s}

    seq("sa3", len(pn.sa3_mlp), f"{prefix}.sa3.mlp_convs.{{}}",
        f"{prefix}.sa3.mlp_bns.{{}}")
    for fp, mlp in (("fp3", pn.fp3_mlp), ("fp2", pn.fp2_mlp),
                    ("fp1", pn.fp1_mlp)):
        seq(fp, len(mlp), f"{prefix}.{fp}.mlp_convs.{{}}",
            f"{prefix}.{fp}.mlp_bns.{{}}")

    p, s = _point_mlp(sd, [f"{prefix}.conv1"], [f"{prefix}.bn1"])
    params["out"] = p
    stats["out"] = s
    return params, stats


def convert_coordnet(sd: dict, cfg: Config, prefix: str = "net") -> dict:
    """CoordNet state_dict -> flax variables {params, batch_stats}."""
    bb_p, bb_s = convert_backbone(sd, f"{prefix}.backbone", cfg.pointnet)
    # seg head: single conv (get_point_mlp(in, out, []), blocks.py:29)
    seg_p, _ = _point_mlp(sd, [f"{prefix}.seg_head.0"], [None])
    # nocs head: conv/BN/ReLU/conv/Sigmoid -> Sequential indices 0,1,3
    n_hidden = len(cfg.network.nocs_head_dims)
    convs, norms = [], []
    idx = 0
    for _ in range(n_hidden):
        convs.append(f"{prefix}.nocs_head.{idx}")
        norms.append(f"{prefix}.nocs_head.{idx + 1}")
        idx += 3  # conv, bn, relu
    convs.append(f"{prefix}.nocs_head.{idx}")
    norms.append(None)
    nocs_p, nocs_s = _point_mlp(sd, convs, norms)
    return {
        "params": {"backbone": bb_p, "seg_head": seg_p,
                   "nocs_head": nocs_p},
        "batch_stats": {"backbone": bb_s, "nocs_head": nocs_s},
    }


def convert_rotnet(sd: dict, cfg: Config, prefix: str = "net") -> dict:
    """PartCanonNet state_dict -> flax variables."""
    enc_p, enc_s = convert_backbone(sd, f"{prefix}.regress_net.encoder",
                                    cfg.pointnet)
    # per-part heads: MLPConv1d Sequential [conv, GN, ReLU] x3 + [conv]
    # -> module indices 0,1 / 3,4 / 6,7 / 9 (blocks.py:147-165)
    P = cfg.obj.num_parts
    layer_conv_idx = [0, 3, 6, 9]
    layer_norm_idx = [1, 4, 7, None]
    heads_p: dict = {}
    for j, (ci, ni) in enumerate(zip(layer_conv_idx, layer_norm_idx)):
        kernels, biases = [], []
        scales, nbiases = [], []
        for p in range(P):
            base = f"{prefix}.regress_net.pose_pred.rtvec_head.{p}.model"
            d = _dense(sd, f"{base}.{ci}")
            kernels.append(d["kernel"])
            biases.append(d["bias"])
            if ni is not None:
                n, _ = _norm(sd, f"{base}.{ni}")
                scales.append(n["scale"])
                nbiases.append(n["bias"])
        heads_p[f"dense_{j}"] = {"kernel": np.stack(kernels),
                                 "bias": np.stack(biases)}
        if ni is not None:
            heads_p[f"norm_{j}"] = {"scale": np.stack(scales),
                                    "bias": np.stack(nbiases)}
    return {
        "params": {"encoder": enc_p,
                   "regressor": {"heads": heads_p}},
        "batch_stats": {"encoder": enc_s},
    }


def convert_track_checkpoint(path: str, cfg: Config):
    """A composed tracking checkpoint (CoordNet under `npcs_net.`, rotation
    net under `net.` — reference trainer.py:159-170) -> (coord_vars,
    rot_vars)."""
    sd = load_torch_state_dict(path)
    coord = convert_coordnet(sd, cfg, prefix="npcs_net")
    rot = convert_rotnet(sd, cfg, prefix="net")
    return coord, rot
