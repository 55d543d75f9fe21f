"""Checkpoint save/load via Orbax, carrying the model config.

Reference behavior: utility/functions.py:14-20 + train.py:361-384 — the
checkpoint embeds the args so the model is always rebuilt from the saved
config (config-from-checkpoint); resume is weights-first. Ours saves
{params, opt_state?, step} through Orbax (TPU-preemption-safe) with a JSON
config sidecar, and supports best/last naming.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from ..models import get_model


def save_checkpoint(directory: str, params, config: Dict[str, Any],
                    step: int = 0, is_best: bool = False,
                    keep_last: bool = True) -> None:
    """Writes `{directory}/last` (and `/best` when is_best) + config.json."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump({"config": config, "step": step}, f, indent=2)
    ckptr = ocp.StandardCheckpointer()
    targets = (["last"] if keep_last else []) + (["best"] if is_best else [])
    if not targets:
        return
    # One device_get + one Orbax serialize; further targets are plain
    # directory copies (a flagship save is ~300 MB over the TPU tunnel,
    # so fetching/serializing once instead of per-target halves the
    # wall cost of an is_best save).
    first = os.path.join(directory, targets[0])
    ckptr.save(first, jax.device_get(params), force=True)
    ckptr.wait_until_finished()
    for name in targets[1:]:
        path = os.path.join(directory, name)
        if os.path.isdir(path):
            shutil.rmtree(path)
        shutil.copytree(first, path)


def remap_single_to_multi(single_params, enhanced_params=None):
    """Map a single-branch checkpoint's subtrees onto multi-branch names
    (reference initialize_model_from_pretrained, functions.py:107-164):
    g_a -> g_a_0, g_s -> g_s_0, h_mean_s -> h_mean_s_0,
    h_scale_s -> h_scale_s_0; cc_/lrp_/entropy subtrees kept as-is; h_a
    dropped (retrained); optional enhanced checkpoint's g_s -> g_s_1.
    Returns a partial params dict to merge into a fresh multi-branch init.
    """
    out: Dict[str, Any] = {}
    for key, sub in single_params.items():
        if key == "g_a":
            out["g_a_0"] = sub
        elif key == "g_s":
            out["g_s_0"] = sub
        elif key == "h_mean_s":
            out["h_mean_s_0"] = sub
        elif key == "h_scale_s":
            out["h_scale_s_0"] = sub
        elif key == "h_a":
            continue
        else:
            out[key] = sub
    if enhanced_params is not None and "g_s" in enhanced_params:
        out["g_s_1"] = enhanced_params["g_s"]
    return out


def stack_legacy_param_nets(params, model):
    """Convert per-slice ParamNet subtrees (``cc_mean_0`` .. style, the
    pre-scan layout) into the stacked layout (``cc_mean`` with leading
    slice axis), zero-padding each slice's ragged first-layer input rows
    at the exact position the fixed-width support layout expects:

    - base nets:   [d0 | sup(k) | +zeros]           (pad after the sups)
    - base lrp:    [d0 | sup(k) | +zeros | y_hat]
    - prog nets:   [dp | base_i | +zeros | muts(k)]  (front-padded slots)
    - prog lrp:    [dp | base_i | +zeros | muts(k) | y_hat]

    Zero rows meet zero inputs, so converted checkpoints reproduce the
    original outputs exactly.
    """
    import numpy as np

    p = dict(params)
    c = model.dim_chunk
    d0 = model.division[0]
    dp = model.division[1] - model.division[0]
    nprog = model.ns1 - model.ns0
    nb, npg = model._n_slots_base, model._n_slots_prog

    def slots_base(i):
        k = i if model.max_support_slices < 0 else \
            min(model.max_support_slices, i)
        return d0 + k * c, (nb - k) * c

    def slots_prog(i):
        k = min(model.support_progressive_slices, i) \
            if model.support_progressive_slices > 0 else 0
        return dp + c, (npg - k) * c

    groups = [("cc_mean", model.ns0, slots_base),
              ("cc_scale", model.ns0, slots_base),
              ("lrp", model.ns0, slots_base),
              ("cc_mean_prog", nprog, slots_prog),
              ("cc_scale_prog", nprog, slots_prog),
              ("lrp_prog", model.ns0, slots_prog)]
    for name, s_count, slot_fn in groups:
        if f"{name}_0" not in p:
            continue
        subs = [p.pop(f"{name}_{i}") for i in range(s_count)]
        n_layers = len(subs[0])
        stacked = {}
        for layer in range(n_layers):
            kernels, biases = [], []
            for i, sub in enumerate(subs):
                kern = np.asarray(sub[f"Conv_{layer}"]["kernel"])
                if layer == 0:
                    pos, pad = slot_fn(i)
                    if pad:
                        z = np.zeros(kern.shape[:2] + (pad,)
                                     + kern.shape[3:], kern.dtype)
                        kern = np.concatenate(
                            [kern[:, :, :pos], z, kern[:, :, pos:]], axis=2)
                kernels.append(kern)
                biases.append(np.asarray(sub[f"Conv_{layer}"]["bias"]))
            stacked[f"Conv_{layer}_kernel"] = jax.numpy.asarray(
                np.stack(kernels))
            stacked[f"Conv_{layer}_bias"] = jax.numpy.asarray(
                np.stack(biases))
        p[name] = stacked

    # REM banks: post_latent_{r}_{i} (uniform shapes) -> post_latent_{r}
    # with a leading slice axis on every leaf (the nn.vmap layout)
    r = 0
    while f"post_latent_{r}_0" in p:
        subs = [p.pop(f"post_latent_{r}_{i}") for i in range(model.ns0)]
        p[f"post_latent_{r}"] = jax.tree.map(
            lambda *leaves: jax.numpy.stack(leaves), *subs)
        r += 1
    return p


def _stacked_dead_blocks(model):
    """Per stacked-net, per-slice (pos, pad): the first-layer kernel input
    rows [pos, pos+pad) multiply support channels that the fixed-width
    layout keeps structurally zero for that slice (the padding that makes
    the ragged reference heads, pic.py:83-164, scannable)."""
    c = model.dim_chunk
    d0 = model.division[0]
    dp = model.division[1] - model.division[0]
    nprog = model.ns1 - model.ns0
    nb, npg = model._n_slots_base, model._n_slots_prog

    def slots_base(i):
        k = i if model.max_support_slices < 0 else \
            min(model.max_support_slices, i)
        return d0 + k * c, (nb - k) * c

    def slots_prog(i):
        k = min(model.support_progressive_slices, i) \
            if model.support_progressive_slices > 0 else 0
        return dp + c, (npg - k) * c

    return [("cc_mean", model.ns0, slots_base),
            ("cc_scale", model.ns0, slots_base),
            ("lrp", model.ns0, slots_base),
            ("cc_mean_prog", nprog, slots_prog),
            ("cc_scale_prog", nprog, slots_prog),
            ("lrp_prog", model.ns0, slots_prog)]


def zero_dead_rows(params, model):
    """Zero the stacked first-layer kernel rows that can never see a
    nonzero input (the zero-padded support slots). Functionally a no-op —
    dead rows only ever multiply zeros and receive zero gradient — but it
    removes the padding's random-init values, so compressed artifacts
    (save_artifact npz) carry no dead weight: the stored parameter content
    equals the reference's ragged per-slice heads (~5.8M padded entries at
    flagship scale, measured; the live padded layout is what makes the
    chains lax.scan-able)."""
    import numpy as np

    p = dict(params)
    for name, s_count, slot_fn in _stacked_dead_blocks(model):
        if name not in p or "Conv_0_kernel" not in p[name]:
            continue
        kern = np.array(jax.device_get(p[name]["Conv_0_kernel"]))
        for i in range(s_count):
            pos, pad = slot_fn(i)
            if pad:
                kern[i, :, :, pos:pos + pad, :] = 0
        sub = dict(p[name])
        sub["Conv_0_kernel"] = jax.numpy.asarray(kern)
        p[name] = sub
    return p


def merge_params(template, partial):
    """Overlay `partial` subtrees onto a freshly-initialized `template`
    wherever paths+shapes match (strict=False load analog)."""
    import jax.tree_util as jtu

    flat_p = dict(jtu.tree_flatten_with_path(partial)[0])
    leaves = []
    for path, val in jtu.tree_flatten_with_path(template)[0]:
        cand = flat_p.get(path)
        if cand is not None and cand.shape == val.shape:
            leaves.append(cand)
        else:
            leaves.append(val)
    return jtu.tree_unflatten(jtu.tree_structure(template), leaves)


def save_artifact(directory: str, params, config: Dict[str, Any],
                  step: int = 0, which: str = "last",
                  dtype: str = "bfloat16") -> str:
    """Compact committed-artifact format: `config.json` + `{which}.npz`
    holding the flattened param tree cast to ``dtype`` (bf16 halves the
    file; inference runs the transforms in bf16 anyway and enc/dec
    bit-identity is per-checkpoint, not per-precision). Loadable by
    load_checkpoint like an Orbax dir."""
    import ml_dtypes  # ships with jax
    import numpy as np

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump({"config": config, "step": step, "dtype": dtype}, f,
                  indent=2)
    try:  # de-pad: dead stacked rows -> zeros, which zlib removes
        cfg = {k: (tuple(v) if isinstance(v, list) else v)
               for k, v in config.items() if k != "model"}
        params = zero_dead_rows(params,
                                get_model(config.get("model", "pic"), **cfg))
    except Exception:
        pass  # non-PIC config; store as-is
    np_dtype = ml_dtypes.bfloat16 if dtype == "bfloat16" else np.dtype(dtype)
    flat = _flatten_tree(jax.device_get(params))
    out = os.path.join(directory, which + ".npz")
    np.savez_compressed(out, **{k: np.asarray(v).astype(np_dtype)
                                for k, v in flat.items()})
    return out


def _flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_tree(v, key))
        else:
            out[key] = v
    return out


def _unflatten_tree(flat: Dict[str, Any]):
    root: Dict[str, Any] = {}
    for key, v in flat.items():
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return root


def load_checkpoint(directory: str, which: str = "last",
                    config_overrides: Optional[Dict[str, Any]] = None,
                    disable_rems_if_missing: bool = True):
    """Returns (model, params, config, step). The model is rebuilt from the
    saved config (with optional overrides, mirroring train.py:98-110's
    REM-field overrides).

    disable_rems_if_missing: a 'rem' config whose checkpoint carries no
    post_latent banks degrades to the plain PIC model with REMs off — the
    reference's load_state_dict behavior (rem_pic.py:66-78), so a PIC
    checkpoint loaded with REM overrides still yields a working codec.
    The REM training stage passes False and fresh-inits the banks instead
    (cli/train.py PIC->REM transition)."""
    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "config.json")) as f:
        meta = json.load(f)
    config = dict(meta["config"])
    if config_overrides:
        config.update(config_overrides)
    name = config.pop("model", "pic")
    model = get_model(name, **{k: (tuple(v) if isinstance(v, list) else v)
                               for k, v in config.items()})
    npz = os.path.join(directory, which + ".npz")
    if os.path.isfile(npz):
        import ml_dtypes
        import numpy as np

        def _restore(a):
            # np.load surfaces bf16 as an opaque |V2 dtype — view it back
            if a.dtype.kind == "V" and a.dtype.itemsize == 2:
                a = a.view(ml_dtypes.bfloat16)
            return jax.numpy.asarray(a, jax.numpy.float32)

        with np.load(npz) as z:
            params = _unflatten_tree({k: _restore(z[k]) for k in z.files})
    else:
        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore(os.path.join(directory, which))
    if "cc_mean_0" in params or "post_latent_0_0" in params:
        # pre-scan per-slice layout
        params = stack_legacy_param_nets(params, model)
    if (disable_rems_if_missing and name == "rem"
            and "post_latent_0" not in params):
        name = "pic"
        for k in ("check_levels", "mu_std", "rem_dimension"):
            config.pop(k, None)
        model = get_model(name, **{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in config.items()})
        print("checkpoint has no REM banks — REMs disabled "
              "(rem_pic.py:66-78 behavior)")
    config["model"] = name
    return model, params, config, meta.get("step", 0)
