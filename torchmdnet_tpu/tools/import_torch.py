"""Import reference (PyTorch TorchMD-NET) checkpoints into this framework.

Maps a Lightning checkpoint's state_dict (keys as produced by the reference,
model.py:133: ``model.`` prefix stripped) onto this framework's flax param
tree, so trained reference models can be served/validated on TPU.

Torch Linear weights are (out, in) and flax kernels (in, out): transposed on
the way in.  LayerNorm weight->scale.  Only architectural hyperparameters
must match (same create_model args); the mapping below follows the module
creation order in our flax implementations.
"""

from typing import Any, Dict

import numpy as np


def _t(w):
    return np.asarray(w).T


def _ln(prefix, sd):
    return {"scale": np.asarray(sd[prefix + ".weight"]), "bias": np.asarray(sd[prefix + ".bias"])}


def _dense(prefix, sd, bias=True):
    out = {"kernel": _t(sd[prefix + ".weight"])}
    if bias:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _perm_cols(dense, perm):
    """Permute a dense layer's output columns (kernel cols + bias)."""
    out = {"kernel": dense["kernel"][:, perm]}
    if "bias" in dense:
        out["bias"] = dense["bias"][perm]
    return out


def _rbf(prefix, sd, trainable):
    if not trainable:
        return None
    out = {}
    if prefix + ".means" in sd:
        out = {"means": np.asarray(sd[prefix + ".means"]), "betas": np.asarray(sd[prefix + ".betas"])}
    elif prefix + ".offset" in sd:
        out = {"offset": np.asarray(sd[prefix + ".offset"]), "coeff": np.asarray(sd[prefix + ".coeff"])}
    return out


def _neighbor_embedding(prefix, sd):
    return {
        "Dense_0": _dense(prefix + ".distance_proj", sd),
        "Embed_0": {"embedding": np.asarray(sd[prefix + ".embedding.weight"])},
        "Dense_1": _dense(prefix + ".combine", sd),
    }


def _gated_block(prefix, sd):
    return {
        "Dense_0": _dense(prefix + ".vec1_proj", sd, bias=False),
        "Dense_1": _dense(prefix + ".vec2_proj", sd, bias=False),
        "Dense_2": _dense(prefix + ".update_net.0", sd),
        "Dense_3": _dense(prefix + ".update_net.2", sd),
    }


def import_representation(args: Dict[str, Any], sd: Dict[str, np.ndarray]):
    """state_dict (representation_model.* keys) -> flax 'representation' tree."""
    model = args["model"]
    p = "representation_model"
    num_layers = args["num_layers"]
    trainable_rbf = args.get("trainable_rbf", False)
    out: Dict[str, Any] = {}

    if model in ("equivariant-transformer", "transformer"):
        out["Embed_0"] = {"embedding": np.asarray(sd[f"{p}.embedding.weight"])}
        rbf = _rbf(f"{p}.distance_expansion", sd, trainable_rbf)
        if rbf:
            rbf_cls = "ExpNormalSmearing_0" if args["rbf_type"] == "expnorm" else "GaussianSmearing_0"
            out[rbf_cls] = rbf
        if args.get("neighbor_embedding"):
            out["NeighborEmbedding_0"] = _neighbor_embedding(f"{p}.neighbor_embedding", sd)
        layer_cls = (
            "EquivariantMultiHeadAttention"
            if model == "equivariant-transformer"
            else "MultiHeadAttention"
        )
        di = args.get("distance_influence", "both")
        for i in range(num_layers):
            lp = f"{p}.attention_layers.{i}"
            layer = {
                "LayerNorm_0": _ln(f"{lp}.layernorm", sd),
                "Dense_0": _dense(f"{lp}.q_proj", sd),
                "Dense_1": _dense(f"{lp}.k_proj", sd),
                "Dense_2": _dense(f"{lp}.v_proj", sd),
            }
            if model == "equivariant-transformer":
                # reference splits v/dv per head; this framework in global
                # thirds — permute the columns (models/et.py:vproj_column_perm)
                from torchmdnet_tpu.models.et import vproj_column_perm

                vperm = vproj_column_perm(
                    args["embedding_dimension"], args.get("num_heads", 8)
                )
                layer["Dense_2"] = _perm_cols(layer["Dense_2"], vperm)
            nxt = 3
            if model == "equivariant-transformer":
                layer[f"Dense_{nxt}"] = _dense(f"{lp}.vec_proj", sd, bias=False)
                nxt += 1
            if di in ("keys", "both"):
                layer[f"Dense_{nxt}"] = _dense(f"{lp}.dk_proj", sd)
                nxt += 1
            if di in ("values", "both"):
                dv = _dense(f"{lp}.dv_proj", sd)
                if model == "equivariant-transformer":
                    dv = _perm_cols(dv, vperm)
                layer[f"Dense_{nxt}"] = dv
                nxt += 1
            layer[f"Dense_{nxt}"] = _dense(f"{lp}.o_proj", sd)
            out[f"{layer_cls}_{i}"] = layer
        out["LayerNorm_0"] = _ln(f"{p}.out_norm", sd)
        return out

    if model == "graph-network":
        out["Embed_0"] = {"embedding": np.asarray(sd[f"{p}.embedding.weight"])}
        rbf = _rbf(f"{p}.distance_expansion", sd, trainable_rbf)
        if rbf:
            rbf_cls = "ExpNormalSmearing_0" if args["rbf_type"] == "expnorm" else "GaussianSmearing_0"
            out[rbf_cls] = rbf
        if args.get("neighbor_embedding"):
            out["NeighborEmbedding_0"] = _neighbor_embedding(f"{p}.neighbor_embedding", sd)
        for i in range(num_layers):
            lp = f"{p}.interactions.{i}"
            out[f"InteractionBlock_{i}"] = {
                "CFConv_0": {
                    "Dense_0": _dense(f"{lp}.mlp.0", sd),
                    "Dense_1": _dense(f"{lp}.mlp.2", sd),
                    "Dense_2": _dense(f"{lp}.conv.lin1", sd, bias=False),
                    "Dense_3": _dense(f"{lp}.conv.lin2", sd),
                },
                "Dense_0": _dense(f"{lp}.lin", sd),
            }
        return out

    if model == "tensornet":
        te = f"{p}.tensor_embedding"
        emb = {
            "Dense_0": _dense(f"{te}.distance_proj1", sd),
            "Dense_1": _dense(f"{te}.distance_proj2", sd),
            "Dense_2": _dense(f"{te}.distance_proj3", sd),
            "Embed_0": {"embedding": np.asarray(sd[f"{te}.emb.weight"])},
            "Dense_3": _dense(f"{te}.emb2", sd),
            "LayerNorm_0": _ln(f"{te}.init_norm", sd),
            "Dense_4": _dense(f"{te}.linears_tensor.0", sd, bias=False),
            "Dense_5": _dense(f"{te}.linears_tensor.1", sd, bias=False),
            "Dense_6": _dense(f"{te}.linears_tensor.2", sd, bias=False),
            "Dense_7": _dense(f"{te}.linears_scalar.0", sd),
            "Dense_8": _dense(f"{te}.linears_scalar.1", sd),
        }
        rbf = _rbf(f"{p}.distance_expansion", sd, trainable_rbf)
        if rbf:
            rbf_cls = "ExpNormalSmearing_0" if args["rbf_type"] == "expnorm" else "GaussianSmearing_0"
            out[rbf_cls] = rbf
        out["TensorEmbedding_0"] = emb
        from torchmdnet_tpu.models.tensornet import wproj_column_perm

        wperm = wproj_column_perm(args["embedding_dimension"])
        for i in range(num_layers):
            lp = f"{p}.layers.{i}"
            out[f"Interaction_{i}"] = {
                "Dense_0": _dense(f"{lp}.linears_scalar.0", sd),
                "Dense_1": _dense(f"{lp}.linears_scalar.1", sd),
                # reference packs the 3H filter (H, 3)-interleaved; this
                # framework slices contiguous thirds (tensornet.py:
                # wproj_column_perm)
                "Dense_2": _perm_cols(_dense(f"{lp}.linears_scalar.2", sd), wperm),
                "Dense_3": _dense(f"{lp}.linears_tensor.0", sd, bias=False),
                "Dense_4": _dense(f"{lp}.linears_tensor.1", sd, bias=False),
                "Dense_5": _dense(f"{lp}.linears_tensor.2", sd, bias=False),
                "Dense_6": _dense(f"{lp}.linears_tensor.3", sd, bias=False),
                "Dense_7": _dense(f"{lp}.linears_tensor.4", sd, bias=False),
                "Dense_8": _dense(f"{lp}.linears_tensor.5", sd, bias=False),
            }
        out["LayerNorm_0"] = _ln(f"{p}.out_norm", sd)
        out["Dense_0"] = _dense(f"{p}.linear", sd)
        return out

    raise ValueError(f"Unknown model: {model}")


def import_head(args: Dict[str, Any], sd: Dict[str, np.ndarray]):
    p = "output_model"
    is_equivariant = args["model"] == "equivariant-transformer"
    name = args.get("output_model", "Scalar")
    if is_equivariant or name.startswith("Equivariant"):
        if name in ("Scalar", "DipoleMoment", "EquivariantScalar", "EquivariantDipoleMoment",
                    "EquivariantVectorOutput"):
            return {
                "block1": _gated_block(f"{p}.output_network.0", sd),
                "block2": _gated_block(f"{p}.output_network.1", sd),
            }
    return {
        "lin1": _dense(f"{p}.output_network.0", sd),
        "lin2": _dense(f"{p}.output_network.2", sd),
    }


def import_priors(args: Dict[str, Any], sd: Dict[str, np.ndarray]):
    out = {}
    i = 0
    while f"prior_model.{i}.atomref.weight" in sd or any(
        k.startswith(f"prior_model.{i}.") for k in sd
    ):
        if f"prior_model.{i}.atomref.weight" in sd:
            out[f"priors_{i}"] = {"atomref": np.asarray(sd[f"prior_model.{i}.atomref.weight"])}
        i += 1
    return out


def import_state_dict(args: Dict[str, Any], state_dict: Dict[str, Any]):
    """Full reference state_dict -> flax params for Potential.apply.

    Accepts torch tensors or numpy arrays as values; ``model.`` prefixes are
    stripped (reference model.py:133 convention).
    """
    sd = {}
    for key, val in state_dict.items():
        if key.startswith("model."):
            key = key[len("model."):]
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        sd[key] = np.asarray(val)

    params = {"representation": import_representation(args, sd)}
    params["head"] = import_head(args, sd)
    params.update(import_priors(args, sd))
    return {"params": params}


def load_torch_checkpoint(filepath, args=None):
    """Load a reference .ckpt (torch.load) and return (args, flax_params)."""
    import torch

    ckpt = torch.load(filepath, map_location="cpu", weights_only=False)
    if args is None:
        args = dict(ckpt["hyper_parameters"])
    params = import_state_dict(args, ckpt["state_dict"])
    return args, params


def import_checkpoint(filepath, **kwargs):
    """Reference .ckpt -> (Potential, flax params), ready for apply.

    kwargs override the checkpoint's hyperparameters (e.g. derivative=True),
    mirroring reference load_model (model.py:121-143).
    """
    from torchmdnet_tpu.models.potential import create_model

    args, params = load_torch_checkpoint(filepath)
    args.update(kwargs)
    model = create_model(args)
    return model, params
