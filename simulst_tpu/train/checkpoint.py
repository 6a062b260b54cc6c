"""Checkpointing: orbax save/load + best-N averaging.

Replaces fairseq's checkpoint machinery used by the reference:
--keep-best-checkpoints with metric-encoded filenames + best-N averaging
(/root/reference/scripts/average_checkpoints.py:76-99), component-wise
pretrained init (s2t_emformer.py:348-360), resume.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp


def save_checkpoint(path: str, state, metadata: Optional[Dict] = None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, {"state": state, "metadata": metadata or {}}, force=True)


def conform_tree(template, restored):
    """Rebuild `restored` (orbax turns lists/tuples/namedtuples into dicts
    with string keys) into the template's structure, casting leaf dtypes.

    NOTE: a naive flatten/unflatten is WRONG for >=10-element lists because
    orbax's dict keys sort lexicographically ("10" < "2"), scrambling layer
    order — conformance must be structural, not positional."""
    if isinstance(template, (list, tuple)) and not hasattr(template, "_fields"):
        items = [restored[str(i)] if isinstance(restored, dict) else restored[i]
                 for i in range(len(template))]
        out = [conform_tree(t, r) for t, r in zip(template, items)]
        return type(template)(out)
    if hasattr(template, "_fields"):  # NamedTuple
        return type(template)(**{
            f: conform_tree(getattr(template, f), restored[f])
            for f in template._fields})
    if isinstance(template, dict):
        return {k: conform_tree(v, restored[k]) for k, v in template.items()}
    if template is None:
        return None
    dtype = getattr(template, "dtype", None)
    return jnp.asarray(restored, dtype)


def _host_restore_args(ckptr, path):
    """RestoreArgs forcing ARRAY leaves to host numpy.  Orbax's default
    restore materializes arrays on the default device using sharding info
    from the checkpoint file; over the remote-TPU tunnel that placement can
    wedge indefinitely (and no caller needs device placement at restore
    time — params reach the device through the jitted steps)."""
    import numpy as np
    import orbax.checkpoint as ocp
    meta = ckptr.metadata(path)
    tree = meta.item_metadata
    tree = tree.tree if hasattr(tree, "tree") else tree

    def to_args(x):
        if isinstance(x, dict):
            return {k: to_args(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return type(x)(to_args(v) for v in x)
        # array leaves must restore to host numpy — a default RestoreArgs
        # fallback here would reintroduce the device-placement wedge — so
        # match structurally (shape+dtype attrs) rather than by orbax's
        # exact metadata class name, which has been renamed across versions
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return ocp.RestoreArgs(restore_type=np.ndarray)
        return ocp.RestoreArgs()

    return to_args(tree)


def _pythonize(tree):
    """Metadata round-trip sanitizer: orbax restores every saved scalar as a
    numpy array (the host-restore args force np.ndarray for anything with
    shape+dtype), but metadata is a plain-python dict at save time — model
    configs rebuilt from it must get plain ints/floats/bools/strs back.  A
    numpy 0-d int reaching e.g. conv_general_dilated's feature_group_count
    is rejected by jax (unhashable jaxpr param) — caught by the round-3
    hardware smoke when stream_eval rebuilt a config from a checkpoint."""
    import numpy as np
    if isinstance(tree, dict):
        return {k: _pythonize(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(_pythonize(v) for v in tree)
    if isinstance(tree, np.ndarray):
        return tree.item() if tree.ndim == 0 else tree.tolist()
    if isinstance(tree, np.generic):
        return tree.item()
    return tree


def load_checkpoint(path: str, template=None, to_device: bool = True):
    """Restore (state, metadata) to HOST memory. `template` (a matching
    pytree) rebuilds the restored tree into the template's structure
    (lists/namedtuples) and dtypes; without it the raw orbax tree (nested
    dicts) is returned, converted to jax arrays unless to_device=False
    (host-only consumers like checkpoint averaging avoid hundreds of eager
    per-leaf device ops through the tunnel)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    restored = ckptr.restore(path, restore_args=_host_restore_args(ckptr, path))
    state = restored["state"]
    meta = restored.get("metadata") or None
    if meta is not None:
        meta = _pythonize(meta)
    if template is not None:
        state = conform_tree(template, state)
    elif to_device:
        # plain host->device transfer (numpy leaves would break eager
        # indexing with tracers at the use sites)
        import numpy as np
        state = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            state)
    return state, meta


BEST_RE = re.compile(r"checkpoint\.best_(?P<metric>[^_]+)_(?P<value>[0-9.]+?)(\.pt)?$")


def find_best_checkpoints(directory: str, n: int = 5,
                          maximize: Optional[bool] = None) -> List[str]:
    """Select best-N by the metric encoded in the filename
    (reference average_checkpoints.py:76-99 pattern
    `checkpoint.best_<metric>_<value>`).  maximize=None infers the direction
    from the metric name (bleu maximizes; loss/wer/latency minimize)."""
    cands = []
    metric = None
    for f in os.listdir(directory):
        m = BEST_RE.match(f)
        if m:
            cands.append((float(m.group("value")), os.path.join(directory, f)))
            metric = m.group("metric")
    if maximize is None:
        maximize = bool(metric and "bleu" in metric)
    cands.sort(key=lambda x: -x[0] if maximize else x[0])
    return [p for _, p in cands[:n]]


def average_params(param_trees: List[Any]):
    """Uniform average of parameter pytrees (checkpoint averaging).
    Runs on whatever the leaves are — pass host numpy trees
    (load_checkpoint(..., to_device=False)) to stay off the device."""
    import numpy as np
    n = len(param_trees)
    assert n > 0
    return jax.tree.map(
        lambda *xs: sum(np.asarray(x, np.float32) if isinstance(x, np.ndarray)
                        else x.astype(jnp.float32) for x in xs) / n,
        *param_trees)


def load_pretrained_component(params, component_params, component: str):
    """Component-wise init: replace params[component] with pretrained weights
    (reference load_pretrained_component_from_model)."""
    out = dict(params)
    out[component] = component_params
    return out
