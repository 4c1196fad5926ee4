"""Reference (haiku) checkpoint import.

The reference stores checkpoints via ``save_haiku`` (reference
lagrangebench/utils.py:50-128): one ``{name}_array.npy`` file holding the
concatenated ``np.save`` streams of all pytree leaves in tree order, plus a
pickled skeleton tree (``{name}_tree.pkl``, every leaf replaced by 0) that
fixes that order. Haiku parameter dicts are keyed by module path, e.g.
``"gns/~/MLP_3/~/linear_0": {"w": ..., "b": ...}``.

This module reads that layout and re-keys the arrays into this package's
flax parameter trees, so published reference checkpoints
(reference README.md:140-155) run through ``infer`` unchanged. The GNS
mapping accounts for the one architectural delta: the flax GNS decomposes
each edge-MLP first layer over ``concat([h_s, h_r, e])`` into three
node/edge-level projections, so the haiku ``(3L, L)`` weight splits into
three ``(L, L)`` blocks (same math — see models/gns.py).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Optional, Tuple

import jax
import numpy as np


def load_haiku_pytree(model_dir: str, name: str):
    """Load one ``save_haiku``-layout pytree (reference utils.py:100-110)."""
    with open(os.path.join(model_dir, f"{name}_tree.pkl"), "rb") as f:
        skeleton = pickle.load(f)
    # old haiku versions pickle FlatMapping; normalize to nested plain dicts
    skeleton = jax.tree.map(lambda x: 0, _to_plain_dict(skeleton))
    leaves, treedef = jax.tree.flatten(skeleton)
    with open(os.path.join(model_dir, f"{name}_array.npy"), "rb") as f:
        arrays = [np.load(f, allow_pickle=False) for _ in leaves]
    return jax.tree.unflatten(treedef, arrays)


def _to_plain_dict(obj):
    if hasattr(obj, "items"):
        return {k: _to_plain_dict(v) for k, v in obj.items()}
    return obj


def is_haiku_checkpoint(model_dir: str) -> bool:
    return os.path.exists(os.path.join(model_dir, "params_array.npy"))


# ---------------------------------------------------------------------------
# GNS
# ---------------------------------------------------------------------------

def _mlp_from_haiku(hk_params: Dict, prefix: str, mlp_name: str,
                    ln_name=None) -> Dict:
    """One haiku `build_mlp` -> flax `MLP` params (Dense_i + LayerNorm_0)."""
    out = {}
    i = 0
    while f"{prefix}/{mlp_name}/~/linear_{i}" in hk_params:
        lin = hk_params[f"{prefix}/{mlp_name}/~/linear_{i}"]
        out[f"Dense_{i}"] = {"kernel": np.asarray(lin["w"]),
                             "bias": np.asarray(lin["b"])}
        i += 1
    assert i > 0, f"no linear layers under {prefix}/{mlp_name}"
    if ln_name is not None:
        ln = hk_params[f"{prefix}/{ln_name}"]
        out["LayerNorm_0"] = {"scale": np.asarray(ln["scale"]),
                              "bias": np.asarray(ln["offset"])}
    return out


def haiku_gns_to_flax(hk_params: Dict, num_mp_steps: int) -> Dict:
    """Re-key a haiku GNS parameter dict into the flax GNS layout.

    Haiku scopes parameters by the *method* that created the module
    (reference models/gns.py:64-208 with `build_mlp`,
    models/utils.py:100-115): ``gns/~/embed`` (init),
    ``gns/~_encoder/MLP[_1]`` + layer_norms (node then edge encoder),
    ``gns/~_processor/MLP_{2i}`` (edge update) and ``MLP_{2i+1}`` (node
    update) per MP step, and ``gns/~_decoder/MLP`` (no LayerNorm).
    Verified against a genuine haiku replica in tests/test_compat.py.
    """
    g = "gns"
    enc, proc, dec = f"{g}/~_encoder", f"{g}/~_processor", f"{g}/~_decoder"
    out: Dict = {
        "Embed_0": {
            "embedding": np.asarray(hk_params[f"{g}/~/embed"]["embeddings"])
        },
        "MLP_0": _mlp_from_haiku(hk_params, enc, "MLP", "layer_norm"),
        "MLP_1": _mlp_from_haiku(hk_params, enc, "MLP_1", "layer_norm_1"),
    }
    latent = out["MLP_0"]["Dense_1"]["kernel"].shape[1]

    for i in range(num_mp_steps):
        mlp_id = 2 + 2 * i
        sfx = "" if 2 * i == 0 else f"_{2 * i}"
        edge = _mlp_from_haiku(
            hk_params, proc, f"MLP{sfx}", f"layer_norm{sfx}"
        )
        # first layer acts on concat([h_s, h_r, e], -1): split the (3L, L)
        # weight into the three decomposed projections (bias goes with e)
        w0, b0 = edge["Dense_0"]["kernel"], edge["Dense_0"]["bias"]
        assert w0.shape[0] == 3 * latent, (
            f"edge MLP_{mlp_id} first layer is {w0.shape}, expected "
            f"({3 * latent}, {latent})"
        )
        out[f"Dense_{3 * i}"] = {"kernel": w0[:latent]}
        out[f"Dense_{3 * i + 1}"] = {"kernel": w0[latent:2 * latent]}
        out[f"Dense_{3 * i + 2}"] = {"kernel": w0[2 * latent:], "bias": b0}
        # remaining layers form the flax message MLP (Dense_j <- linear_{j+1})
        n_lin = len([k for k in edge if k.startswith("Dense")])
        msg = {
            f"Dense_{j - 1}": edge[f"Dense_{j}"] for j in range(1, n_lin)
        }
        msg["LayerNorm_0"] = edge["LayerNorm_0"]
        out[f"MLP_{mlp_id}"] = msg

        out[f"MLP_{3 + 2 * i}"] = _mlp_from_haiku(
            hk_params, proc, f"MLP_{2 * i + 1}", f"layer_norm_{2 * i + 1}"
        )

    out[f"MLP_{2 + 2 * num_mp_steps}"] = _mlp_from_haiku(hk_params, dec, "MLP")
    return out


# ---------------------------------------------------------------------------
# EGNN
# ---------------------------------------------------------------------------

def _lin(hk_params: Dict, path: str, with_bias: bool = True) -> Dict:
    """One haiku Linear bundle -> flax Dense params."""
    lin = hk_params[path]
    out = {"kernel": np.asarray(lin["w"])}
    if with_bias:
        out["bias"] = np.asarray(lin["b"])
    return out


def _xav_mlp(hk_params: Dict, prefix: str) -> Dict:
    """One haiku MLPXav (hk.nets.MLP) -> flax MLPXav params."""
    out = {}
    i = 0
    while f"{prefix}/~/linear_{i}" in hk_params:
        out[f"Dense_{i}"] = _lin(hk_params, f"{prefix}/~/linear_{i}")
        i += 1
    assert i > 0, f"no linear layers under {prefix}"
    return out


def haiku_egnn_to_flax(hk_params: Dict, num_mp_steps: int) -> Dict:
    """Re-key a haiku EGNN parameter dict into the flax EGNN layout.

    Haiku paths (reference models/egnn.py:25-206; layers are created inside
    ``EGNN.__call__`` so they scope directly under "egnn"): ``egnn/scalar_emb``
    (input embedding), per layer ``egnn/layer_k/~/mlp`` (edge MLP),
    ``mlp_1`` (node MLP), ``linear``/``linear_1`` (position-correction head,
    final layer bias-free) and ``linear_2``/``linear_3`` (velocity-correction
    head). Verified against a genuine haiku replica in tests/test_compat.py.
    Assumes the shipped ``blocks=1`` (the reference runner never overrides
    it; blocks>1 would share one haiku module across block slots).
    """
    out: Dict = {"Dense_0": _lin(hk_params, "egnn/scalar_emb")}
    for k in range(num_mp_steps):
        lyr = f"egnn/layer_{k}"
        assert f"{lyr}/~/linear_4" not in hk_params, (
            "unexpected attention/blocks>1 EGNN checkpoint layout"
        )
        out[f"EGNNLayer_{k}"] = {
            "MLPXav_0": _xav_mlp(hk_params, f"{lyr}/~/mlp"),
            "MLPXav_1": _xav_mlp(hk_params, f"{lyr}/~/mlp_1"),
            "Dense_0": _lin(hk_params, f"{lyr}/~/linear"),
            "Dense_1": _lin(hk_params, f"{lyr}/~/linear_1", with_bias=False),
            "Dense_2": _lin(hk_params, f"{lyr}/~/linear_2"),
            "Dense_3": _lin(hk_params, f"{lyr}/~/linear_3", with_bias=False),
        }
    return out


# ---------------------------------------------------------------------------
# PaiNN
# ---------------------------------------------------------------------------

def haiku_painn_to_flax(
    hk_params: Dict, num_mp_steps: int, shared_filters: bool = False
) -> Dict:
    """Re-key a haiku PaiNN parameter dict into the flax PaiNN layout.

    Haiku paths (reference models/painn.py:355-434): the trainable RBF
    lives at the transform's root bundle ``~`` (``gaussian_rbf`` is called
    outside any module, reference runner.py:279), ``painn/~/filter_net`` is
    ONE linear producing all layers' filters (split per layer here — the
    flax model computes filters lazily per layer from sliced weights),
    ``painn/~/{scalar,vector}_embedding``, per layer
    ``painn/~/layer_i/~/linear{,\\_1}`` (interaction block),
    ``vector_mixing_block``, ``linear_2``/``linear_3`` (mixing block), and
    readout blocks ``painn/readout_block_{0,out}/~/...``. Verified against
    a genuine haiku replica in tests/test_compat.py.
    """
    rbf = hk_params["~"]
    out: Dict = {
        "GaussianRBF_0": {
            "widths": np.asarray(rbf["widths"]),
            "offset": np.asarray(rbf["offset"]),
        },
        "LinearXav_0": {"Dense_0": _lin(hk_params, "painn/~/scalar_embedding")},
        "LinearXav_1": {
            "Dense_0": _lin(hk_params, "painn/~/vector_embedding", with_bias=False)
        },
    }

    fw = np.asarray(hk_params["painn/~/filter_net"]["w"])
    fb = np.asarray(hk_params["painn/~/filter_net"]["b"])
    if shared_filters:
        # shared_filters layout: one (n_rbf, 3H) linear reused per layer
        out["filter_net"] = {"Dense_0": {"kernel": fw, "bias": fb}}
    else:
        # per-layer filters (the reference runner's only layout): the single
        # (n_rbf, L*3H) linear is column-sliced into this package's
        # per-layer filter_net_i modules
        assert fw.shape[1] % num_mp_steps == 0, (
            f"filter_net width {fw.shape[1]} not divisible by "
            f"num_mp_steps={num_mp_steps}; shared_filters checkpoint?"
        )
        latent3 = fw.shape[1] // num_mp_steps
        for i in range(num_mp_steps):
            sl = slice(i * latent3, (i + 1) * latent3)
            out[f"filter_net_{i}"] = {
                "Dense_0": {"kernel": fw[:, sl], "bias": fb[sl]}
            }

    for i in range(num_mp_steps):
        lyr = f"painn/~/layer_{i}"
        if lyr + "/~/linear" not in hk_params and i > 0:
            raise NotImplementedError(
                "shared_interactions PaiNN checkpoints are not supported"
            )
        out[f"PaiNNLayer_{i}"] = {
            "LinearXav_0": {"Dense_0": _lin(hk_params, f"{lyr}/~/linear")},
            "LinearXav_1": {"Dense_0": _lin(hk_params, f"{lyr}/~/linear_1")},
            "LinearXav_2": {
                "Dense_0": _lin(
                    hk_params, f"{lyr}/~/vector_mixing_block", with_bias=False
                )
            },
            "LinearXav_3": {"Dense_0": _lin(hk_params, f"{lyr}/~/linear_2")},
            "LinearXav_4": {"Dense_0": _lin(hk_params, f"{lyr}/~/linear_3")},
        }

    for j, blk in enumerate(["readout_block_0", "readout_block_out"]):
        pre = f"painn/{blk}"
        out[f"GatedEquivariantBlock_{j}"] = {
            "LinearXav_0": {
                "Dense_0": _lin(
                    hk_params, f"{pre}/~/vector_mix_net", with_bias=False
                )
            },
            "LinearXav_1": {"Dense_0": _lin(hk_params, f"{pre}/~/linear")},
            "LinearXav_2": {"Dense_0": _lin(hk_params, f"{pre}/~/linear_1")},
        }
    return out


# ---------------------------------------------------------------------------
# Linear baseline
# ---------------------------------------------------------------------------

def haiku_linear_to_flax(hk_params: Dict) -> Dict:
    """Reference `Linear` is a single hk.Linear named under "linear_model"
    (reference models/linear.py)."""
    key = next(k for k in hk_params if "linear" in k)
    lin = hk_params[key]
    return {
        "Dense_0": {"kernel": np.asarray(lin["w"]),
                    "bias": np.asarray(lin["b"])}
    }


# ---------------------------------------------------------------------------
# SEGNN (DRAFT — numerically UNVALIDATED; see PARITY.md "SEGNN importer")
#
# The reference's SEGNN parameters live inside e3nn.haiku.Linear modules
# (reference models/segnn.py:89-95). This environment has no e3nn-jax, so
# the mapping below could not be validated against genuine e3nn layouts —
# it encodes the best-effort spec (haiku paths, e3nn instruction
# enumeration, normalization constants) read from the reference source and
# the e3nn-jax conventions, fails loudly on any mismatch with the actual
# checkpoint, and refuses to run unless `allow_unvalidated=True`.
# Validation recipe for a networked host: PARITY.md.
# ---------------------------------------------------------------------------

def _e3nn_ir_sort_key(l: int, p: int):
    """Assumed e3nn Irrep ordering: by l, then 'natural parity' first
    (0e < 0o, 1o < 1e, 2e < 2o, ...) — i.e. p = (-1)**l sorts first."""
    return (l, -p * (-1) ** l)


def _e3nn_tp_output_groups(x_irreps, y_irreps):
    """Assumed e3nn ``tensor_product(x, y)`` output grouping.

    ASSUMPTION (unvalidated here): products enumerate x-group-major, then
    y-group, then output l ascending in ``|l1-l2|..l1+l2`` with parity
    ``p1*p2``; the result is sorted by irrep (STABLE) and consecutive
    equal irreps merge. Returns:

    * ``groups``: list of ``(mul_total, (l, p))`` — the e3nn Linear's
      ``irreps_in`` groups, index = the ``a`` in its ``w[a,b]`` names;
    * ``rows``: dict ``(i, j, (l, p)) -> (group_index, row_offset)``
      locating MY path (x-group i, y-group j, output ir) inside group
      ``a``'s ``mul_total`` rows (chunk channel order is x-multiplicity
      -major, trivially matching ours since every SEGNN y-group has
      mul 1).
    """
    from .models.e3.irreps import Irrep

    chunks = []  # (sort_key, birth_order, mul, (l, p), (i, j))
    birth = 0
    for i, gx in enumerate(x_irreps):
        for j, gy in enumerate(y_irreps):
            for ir in gx.ir * gy.ir:  # l ascending, parity fixed
                chunks.append((
                    _e3nn_ir_sort_key(ir.l, ir.p), birth,
                    gx.mul * gy.mul, (ir.l, ir.p), (i, j),
                ))
                birth += 1
    chunks.sort(key=lambda c: (c[0], c[1]))  # stable by construction

    groups = []
    rows = {}
    for key, _, mul, irlp, (i, j) in chunks:
        if groups and groups[-1][1] == irlp:
            off = groups[-1][0]
            groups[-1] = (off + mul, irlp)
        else:
            off = 0
            groups.append((mul, irlp))
        rows[(i, j, Irrep(*irlp))] = (len(groups) - 1, off)
    return groups, rows


def _e3nn_out_groups(out_irreps):
    """Assumed e3nn Linear ``irreps_out`` = regroup of the requested
    output (reference O3TensorProductGate regroups gates+outputs,
    segnn.py:164-166). Returns (groups, map my k_out -> (b, col_off))."""
    groups = []
    colmap = {}
    order = sorted(
        range(len(out_irreps)),
        key=lambda k: (_e3nn_ir_sort_key(out_irreps[k].ir.l,
                                         out_irreps[k].ir.p), k),
    )
    for k in order:
        g = out_irreps[k]
        irlp = (g.ir.l, g.ir.p)
        if groups and groups[-1][1] == irlp:
            colmap[k] = (len(groups) - 1, groups[-1][0])
            groups[-1] = (groups[-1][0] + g.mul, irlp)
        else:
            groups.append((g.mul, irlp))
            colmap[k] = (len(groups) - 1, 0)
    return groups, colmap


def _parse_e3nn_param_name(name: str):
    """Parse e3nn.haiku.Linear parameter names.

    ASSUMED forms (e3nn-jax _src/linear_haiku.py):
        "w[a,b] <irreps_in[a]>,<irreps_out[b]>"  — weight (mul_a, mul_b)
        "b[b] <irreps_out[b]>"                   — bias (mul_b,)
    Returns ("w", a, b) / ("b", None, b) / None for unrecognized.
    """
    import re

    m = re.match(r"^w\[(\d+),(\d+)\]", name)
    if m:
        return ("w", int(m.group(1)), int(m.group(2)))
    m = re.match(r"^b\[(\d+)\]", name)
    if m:
        return ("b", None, int(m.group(1)))
    return None


def segnn_site_specs(model, sample):
    """Init the flax SEGNN once and return its importer metadata.

    Returns ``(params, specs)`` where specs maps each O3TensorProduct's
    flax path ("SEGNNLayer_0/O3TensorProductGate_1/O3TensorProduct_0") to
    its ``(x_irreps, y_irreps, out_irreps)`` strings (sown at init,
    models/e3/tensor.py).
    """
    import jax as _jax

    from .models.e3 import tensor as _e3_tensor

    _e3_tensor._CAPTURE_SITE_SPECS = True
    try:
        variables = model.init(_jax.random.PRNGKey(0), sample)
    finally:
        _e3_tensor._CAPTURE_SITE_SPECS = False
    specs = {}

    def walk(tree, prefix):
        if isinstance(tree, tuple) and len(tree) == 3:
            specs["/".join(prefix[:-1])] = tree
            return
        for k, v in tree.items():
            walk(v, prefix + [k])

    walk(variables["site_spec"], [])
    return variables["params"], specs


#: flax top-level module -> reference haiku module path stem
#: (reference creation sites: embedding segnn.py:201-203, layer tps
#: :302,:324,:328 — haiku uniquifies the update duplicates to tp_i_1 —
#: decoder readouts :241, output :245)
def _segnn_haiku_stem(flax_path: str) -> str:
    parts = flax_path.split("/")
    top = parts[0]
    if top == "O3TensorProduct_0":
        return "segnn/~/embedding_nodes"
    if top == "O3TensorProduct_1":
        return "segnn/~/output"
    if top.startswith("O3TensorProductGate_"):
        return f"segnn/~/readout_{int(top.rsplit('_', 1)[1])}"
    if top.startswith("SEGNNLayer_"):
        k = int(top.rsplit("_", 1)[1])
        sub = parts[1]
        table = {
            "O3TensorProductGate_0": "tp_0",       # message block 0
            "O3TensorProductGate_1": "tp_1",       # message block 1
            "O3TensorProductGate_2": "tp_0_1",     # update block 0
            "O3TensorProduct_0": "tp_1_1",         # update final (plain)
        }
        return f"segnn/~/layer_{k}/~/{table[sub]}"
    raise KeyError(f"unrecognized flax SEGNN site {flax_path!r}")


def haiku_segnn_to_flax(
    hk_params: Dict,
    model,
    sample,
    *,
    allow_unvalidated: bool = False,
    forward_alpha: str = "folded",
    sign_overrides: Optional[Dict] = None,
) -> Dict:
    """DRAFT importer: reference (e3nn.haiku) SEGNN -> flax params.

    UNVALIDATED — this environment has no e3nn-jax, so the spec encoded
    here (haiku module paths, e3nn tensor_product output ordering, Linear
    instruction enumeration and normalization) was derived from source
    reading, not verified against genuine layouts. It refuses to run
    unless ``allow_unvalidated=True`` and raises with a full
    found-vs-expected dump on ANY structural mismatch, so a networked
    host can validate/fix it quickly (recipe: PARITY.md).

    Scaling model: with the reference's ``gradient_normalization=
    "element"`` the e3nn Linear folds its per-instruction normalization
    into the stored weights (forward multiplier 1), while our
    O3TensorProduct multiplies by ``1/sqrt(fan_in)`` at forward time
    (models/e3/tensor.py) — so each weight block is scaled by
    ``sqrt(fan_in)``. Both CG conventions carry ``sum(C^2) = 2*l3+1``
    (ours by construction, e3nn's unit-norm wigner times the "component"
    sqrt(2l3+1)), leaving at most a per-(l1,l2,l3) SIGN between the two
    intertwiner bases — supply measured signs via ``sign_overrides``
    ({(l1, l2, l3): +-1.0}, default +1).

    Args:
        hk_params: haiku params dict (module path -> {name: array}).
        model: the flax SEGNN instance to import into.
        sample: one (features, particle_type) sample for model.init.
        allow_unvalidated: must be True; guards silent corruption.
        forward_alpha: "folded" (assumed e3nn behavior) — reserved knob
            for the alternative per-path forward multiplier convention.
        sign_overrides: per-CG-triple sign corrections.
    """
    if not allow_unvalidated:
        raise NotImplementedError(
            "haiku_segnn_to_flax is a numerically UNVALIDATED draft (no "
            "e3nn-jax in the build environment to validate against — "
            "PARITY.md). Pass allow_unvalidated=True to run it anyway."
        )
    assert forward_alpha == "folded", "only the 'folded' model is drafted"
    from .models.e3.irreps import Irreps

    signs = sign_overrides or {}
    params, specs = segnn_site_specs(model, sample)
    problems = []
    out = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), params)

    consumed = set()
    for flax_path, (x_s, y_s, o_s) in specs.items():
        x_ir, y_ir, o_ir = Irreps(x_s), Irreps(y_s), Irreps(o_s)
        stem = _segnn_haiku_stem(flax_path)
        hk_key = f"{stem}/~/linear"
        consumed.add(hk_key)
        if hk_key not in hk_params:
            problems.append(f"missing haiku module {hk_key!r} "
                            f"(for flax site {flax_path})")
            continue
        hk_mod = hk_params[hk_key]
        in_groups, rows = _e3nn_tp_output_groups(x_ir, y_ir)
        out_groups, colmap = _e3nn_out_groups(o_ir)

        # cross-check every parsed haiku name against the expectation
        weights = {}
        biases = {}
        for name, arr in hk_mod.items():
            parsed = _parse_e3nn_param_name(name)
            if parsed is None:
                problems.append(f"{hk_key}: unrecognized param {name!r}")
                continue
            kind, a, b = parsed
            if kind == "w":
                exp = (in_groups[a][0], out_groups[b][0])
                if tuple(arr.shape) != exp:
                    problems.append(
                        f"{hk_key}/{name}: shape {arr.shape}, expected "
                        f"{exp} from groups in={in_groups} out={out_groups}"
                    )
                weights[(a, b)] = np.asarray(arr)
            else:
                exp_b = (out_groups[b][0],)
                if tuple(arr.shape) != exp_b:
                    problems.append(
                        f"{hk_key}/{name}: shape {arr.shape}, expected "
                        f"{exp_b} from out groups {out_groups}"
                    )
                biases[b] = np.asarray(arr)

        # assemble MY parameter blocks (same path enumeration as
        # models/e3/tensor.py)
        node = out
        for p in flax_path.split("/"):
            node = node[p]
        for k_out, g_out in enumerate(o_ir):
            paths = [
                (i, j)
                for i, gx in enumerate(x_ir)
                for j, gy in enumerate(y_ir)
                if g_out.ir in gx.ir * gy.ir
            ]
            use_bias = f"b_{k_out}" in node
            fan_in = sum(
                x_ir[i].mul * y_ir[j].mul for i, j in paths
            ) + int(use_bias)
            scale = float(np.sqrt(fan_in))
            b_grp, c_off = colmap[k_out]
            for i, j in paths:
                a_grp, r_off = rows[(i, j, g_out.ir)]
                w_name = f"w_{k_out}_{i}_{j}"
                if (a_grp, b_grp) not in weights:
                    problems.append(
                        f"{hk_key}: no w[{a_grp},{b_grp}] for flax "
                        f"{flax_path}/{w_name}"
                    )
                    continue
                blk = weights[(a_grp, b_grp)][
                    r_off : r_off + x_ir[i].mul * y_ir[j].mul,
                    c_off : c_off + g_out.mul,
                ]
                if blk.shape != node[w_name].shape:
                    problems.append(
                        f"{hk_key}: slice for {flax_path}/{w_name} has "
                        f"shape {blk.shape}, flax expects "
                        f"{node[w_name].shape}"
                    )
                    continue
                y_l = y_ir[j].ir.l
                s = signs.get((x_ir[i].ir.l, y_l, g_out.ir.l), 1.0)
                node[w_name] = (blk * (scale * s)).astype(np.float32)
            if use_bias:
                if b_grp not in biases:
                    problems.append(
                        f"{hk_key}: no b[{b_grp}] for flax "
                        f"{flax_path}/b_{k_out}"
                    )
                    continue
                # my bias adds AFTER the alpha multiply, e3nn's bias
                # instruction has path weight 1 under "element" — copied
                # unscaled
                node[f"b_{k_out}"] = biases[b_grp][
                    c_off : c_off + g_out.mul
                ].astype(np.float32)

    # the loud-fail must be bidirectional: a haiku module the mapping
    # never consumed means the spec's module table is wrong/incomplete
    # (e.g. a BatchNorm variant or an edge-embedding branch we dropped)
    for hk_key in hk_params:
        if hk_key not in consumed:
            problems.append(f"haiku module {hk_key!r} not consumed by the "
                            "flax site map")

    if problems:
        raise ValueError(
            "haiku_segnn_to_flax: structural mismatches between the "
            "checkpoint and the encoded spec (fix the spec constants, "
            "PARITY.md):\n  - " + "\n  - ".join(problems[:40])
            + (f"\n  ... and {len(problems) - 40} more" if len(problems) > 40
               else "")
        )
    return out


_IMPORTERS = {
    "gns": lambda hk, cfg: haiku_gns_to_flax(hk, int(cfg["num_mp_steps"])),
    "egnn": lambda hk, cfg: haiku_egnn_to_flax(hk, int(cfg["num_mp_steps"])),
    "painn": lambda hk, cfg: haiku_painn_to_flax(hk, int(cfg["num_mp_steps"])),
    "linear": lambda hk, cfg: haiku_linear_to_flax(hk),
}


# ---------------------------------------------------------------------------
# Export: flax -> reference haiku layout (the exact inverses of the
# importers above, so checkpoints trained here can be evaluated by the
# reference's `infer`/`load_haiku` unchanged — reference utils.py:50-128).
# Round-trip exactness (haiku -> flax -> haiku, bitwise) is asserted against
# the genuine-haiku replicas in tests/test_compat.py.
# ---------------------------------------------------------------------------

def _mlp_to_haiku(out: Dict, flax_mlp: Dict, prefix: str, mlp_name: str,
                  ln_name=None) -> None:
    """Inverse of `_mlp_from_haiku`: flax MLP params -> haiku path bundles."""
    i = 0
    while f"Dense_{i}" in flax_mlp:
        lin = flax_mlp[f"Dense_{i}"]
        out[f"{prefix}/{mlp_name}/~/linear_{i}"] = {
            "w": np.asarray(lin["kernel"]), "b": np.asarray(lin["bias"])
        }
        i += 1
    assert i > 0, f"no Dense layers in flax MLP for {prefix}/{mlp_name}"
    if ln_name is not None:
        ln = flax_mlp["LayerNorm_0"]
        out[f"{prefix}/{ln_name}"] = {
            "scale": np.asarray(ln["scale"]), "offset": np.asarray(ln["bias"])
        }


def flax_gns_to_haiku(params: Dict, num_mp_steps: int) -> Dict:
    """Inverse of `haiku_gns_to_flax`: re-key flax GNS params to the haiku
    module paths the reference model produces, re-fusing the decomposed
    edge-MLP first layer back into one (3L, L) weight over
    concat([h_s, h_r, e])."""
    g = "gns"
    enc, proc, dec = f"{g}/~_encoder", f"{g}/~_processor", f"{g}/~_decoder"
    out: Dict = {
        f"{g}/~/embed": {
            "embeddings": np.asarray(params["Embed_0"]["embedding"])
        }
    }
    _mlp_to_haiku(out, params["MLP_0"], enc, "MLP", "layer_norm")
    _mlp_to_haiku(out, params["MLP_1"], enc, "MLP_1", "layer_norm_1")

    for i in range(num_mp_steps):
        sfx = "" if 2 * i == 0 else f"_{2 * i}"
        # re-fuse the three decomposed projections into linear_0
        w = np.concatenate(
            [np.asarray(params[f"Dense_{3 * i + j}"]["kernel"])
             for j in range(3)], axis=0,
        )
        b = np.asarray(params[f"Dense_{3 * i + 2}"]["bias"])
        out[f"{proc}/MLP{sfx}/~/linear_0"] = {"w": w, "b": b}
        msg = params[f"MLP_{2 + 2 * i}"]
        j = 0
        while f"Dense_{j}" in msg:
            lin = msg[f"Dense_{j}"]
            out[f"{proc}/MLP{sfx}/~/linear_{j + 1}"] = {
                "w": np.asarray(lin["kernel"]), "b": np.asarray(lin["bias"])
            }
            j += 1
        ln = msg["LayerNorm_0"]
        out[f"{proc}/layer_norm{sfx}"] = {
            "scale": np.asarray(ln["scale"]), "offset": np.asarray(ln["bias"])
        }
        _mlp_to_haiku(
            out, params[f"MLP_{3 + 2 * i}"], proc,
            f"MLP_{2 * i + 1}", f"layer_norm_{2 * i + 1}",
        )

    _mlp_to_haiku(out, params[f"MLP_{2 + 2 * num_mp_steps}"], dec, "MLP")
    return out


def _lin_to_haiku(flax_dense: Dict) -> Dict:
    out = {"w": np.asarray(flax_dense["kernel"])}
    if "bias" in flax_dense:
        out["b"] = np.asarray(flax_dense["bias"])
    return out


def _xav_mlp_to_haiku(out: Dict, flax_mlp: Dict, prefix: str) -> None:
    i = 0
    while f"Dense_{i}" in flax_mlp:
        out[f"{prefix}/~/linear_{i}"] = _lin_to_haiku(flax_mlp[f"Dense_{i}"])
        i += 1
    assert i > 0, f"no Dense layers for {prefix}"


def flax_egnn_to_haiku(params: Dict, num_mp_steps: int) -> Dict:
    """Inverse of `haiku_egnn_to_flax`."""
    out: Dict = {"egnn/scalar_emb": _lin_to_haiku(params["Dense_0"])}
    for k in range(num_mp_steps):
        lyr_p = params[f"EGNNLayer_{k}"]
        lyr = f"egnn/layer_{k}"
        _xav_mlp_to_haiku(out, lyr_p["MLPXav_0"], f"{lyr}/~/mlp")
        _xav_mlp_to_haiku(out, lyr_p["MLPXav_1"], f"{lyr}/~/mlp_1")
        out[f"{lyr}/~/linear"] = _lin_to_haiku(lyr_p["Dense_0"])
        out[f"{lyr}/~/linear_1"] = _lin_to_haiku(lyr_p["Dense_1"])
        out[f"{lyr}/~/linear_2"] = _lin_to_haiku(lyr_p["Dense_2"])
        out[f"{lyr}/~/linear_3"] = _lin_to_haiku(lyr_p["Dense_3"])
    return out


def flax_painn_to_haiku(
    params: Dict, num_mp_steps: int, shared_filters: bool = False
) -> Dict:
    """Inverse of `haiku_painn_to_flax`: per-layer filter_net_i kernels are
    re-concatenated column-wise into the reference's single
    (n_rbf, L*3H) filter_net linear."""
    rbf = params["GaussianRBF_0"]
    out: Dict = {
        "~": {"widths": np.asarray(rbf["widths"]),
              "offset": np.asarray(rbf["offset"])},
        "painn/~/scalar_embedding": _lin_to_haiku(
            params["LinearXav_0"]["Dense_0"]),
        "painn/~/vector_embedding": _lin_to_haiku(
            params["LinearXav_1"]["Dense_0"]),
    }

    if shared_filters:
        out["painn/~/filter_net"] = _lin_to_haiku(
            params["filter_net"]["Dense_0"])
    else:
        fws, fbs = [], []
        for i in range(num_mp_steps):
            lin = params[f"filter_net_{i}"]["Dense_0"]
            fws.append(np.asarray(lin["kernel"]))
            fbs.append(np.asarray(lin["bias"]))
        out["painn/~/filter_net"] = {
            "w": np.concatenate(fws, axis=1), "b": np.concatenate(fbs)
        }

    hk_names = ("linear", "linear_1", "vector_mixing_block",
                "linear_2", "linear_3")
    for i in range(num_mp_steps):
        lyr_p = params[f"PaiNNLayer_{i}"]
        for j, hk_name in enumerate(hk_names):
            out[f"painn/~/layer_{i}/~/{hk_name}"] = _lin_to_haiku(
                lyr_p[f"LinearXav_{j}"]["Dense_0"])

    for j, blk in enumerate(["readout_block_0", "readout_block_out"]):
        blk_p = params[f"GatedEquivariantBlock_{j}"]
        pre = f"painn/{blk}"
        out[f"{pre}/~/vector_mix_net"] = _lin_to_haiku(
            blk_p["LinearXav_0"]["Dense_0"])
        out[f"{pre}/~/linear"] = _lin_to_haiku(blk_p["LinearXav_1"]["Dense_0"])
        out[f"{pre}/~/linear_1"] = _lin_to_haiku(
            blk_p["LinearXav_2"]["Dense_0"])
    return out


def flax_linear_to_haiku(params: Dict) -> Dict:
    """Inverse of `haiku_linear_to_flax` (reference models/linear.py creates
    one hk.Linear inside the "linear" module's __init__)."""
    return {"linear/~/linear": _lin_to_haiku(params["Dense_0"])}


_EXPORTERS = {
    "gns": lambda p, cfg: flax_gns_to_haiku(p, int(cfg["num_mp_steps"])),
    "egnn": lambda p, cfg: flax_egnn_to_haiku(p, int(cfg["num_mp_steps"])),
    "painn": lambda p, cfg: flax_painn_to_haiku(p, int(cfg["num_mp_steps"])),
    "linear": lambda p, cfg: flax_linear_to_haiku(p),
}


def _save_pytree_reference(ckp_dir: str, pytree, name: str) -> None:
    """Write one pytree in the reference's on-disk layout (reference
    utils.py:50-58): concatenated np.save leaf stream + pickled skeleton."""
    with open(os.path.join(ckp_dir, f"{name}_array.npy"), "wb") as f:
        for x in jax.tree.leaves(pytree):
            np.save(f, np.asarray(x), allow_pickle=False)
    skeleton = jax.tree.map(lambda t: 0, pytree)
    with open(os.path.join(ckp_dir, f"{name}_tree.pkl"), "wb") as f:
        pickle.dump(skeleton, f)


def save_reference_checkpoint(
    ckp_dir: str, model_name: str, params: Dict, cfg_model: Dict,
    step: int = 0, loss: float = 0.0,
) -> None:
    """Export flax params as a reference `save_haiku` checkpoint directory.

    Produces `params_{array.npy,tree.pkl}`, an empty haiku state, a pickled
    empty opt_state (the reference's `load_haiku` unconditionally unpickles
    `opt_state.pkl`; its `infer` never uses it), and `metadata_ckp.json` —
    everything `infer(..., load_ckp=ckp_dir)` reads in the reference
    (reference utils.py:100-128, evaluate/rollout.py:311-399).
    """
    model_name = model_name.lower()
    if model_name not in _EXPORTERS:
        raise NotImplementedError(
            f"haiku checkpoint export not implemented for '{model_name}' "
            f"(available: {sorted(_EXPORTERS)})"
        )
    import json

    # fused-variant checkpoints (model.fused_processor / use_fused_layer)
    # re-layout to the standard naming first — exact inverses
    mp_steps = int(cfg_model.get("num_mp_steps", 0) or 0)
    if model_name == "gns" and any(str(k).startswith("mp0_") for k in params):
        from .models.gns import standard_params_from_fused

        params = standard_params_from_fused(params, mp_steps)
    if model_name == "painn" and "filt_w" in params.get("PaiNNLayer_0", {}):
        from .models.painn import painn_standard_params_from_fused

        params = painn_standard_params_from_fused(params, mp_steps)

    os.makedirs(ckp_dir, exist_ok=True)
    hk_params = _EXPORTERS[model_name](params, cfg_model)
    _save_pytree_reference(ckp_dir, hk_params, "params")
    _save_pytree_reference(ckp_dir, {}, "state")
    with open(os.path.join(ckp_dir, "opt_state.pkl"), "wb") as f:
        pickle.dump((), f)
    with open(os.path.join(ckp_dir, "metadata_ckp.json"), "w") as f:
        json.dump({"step": int(step), "loss": float(loss)}, f)
    print(f"Exported reference-layout checkpoint to {ckp_dir}")


def load_reference_checkpoint(
    model_dir: str, model_name: str, cfg_model: Dict
) -> Tuple[Dict, Dict, int]:
    """Load a reference `save_haiku` checkpoint as (params, state, step)."""
    import json

    model_name = model_name.lower()
    if model_name not in _IMPORTERS:
        raise NotImplementedError(
            f"haiku checkpoint import not implemented for '{model_name}' "
            f"(available: {sorted(_IMPORTERS)})"
        )
    hk_params = load_haiku_pytree(model_dir, "params")
    params = _IMPORTERS[model_name](hk_params, cfg_model)
    # reference models keep no haiku state (stateless apply)
    step = 0
    meta_path = os.path.join(model_dir, "metadata_ckp.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            step = json.load(f).get("step", 0)
    print(f"Imported reference haiku checkpoint from {model_dir} (step {step})")
    return params, {}, step
