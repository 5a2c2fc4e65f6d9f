"""Checkpoint / resume.

The reference exposes ParameterClass.state_dict()/from_state_dict for
parameters + optimizer state (optim/parameter_class.py:93-116) and leaves
periodic checkpointing to the external trainer. Here: save/load of any
pytree (including ParameterClass state dicts) as a compressed npz, plus
an orbax-backed variant when available.
"""

import json
import os
import pickle
from typing import Any

import jax
import numpy as np


def save_checkpoint(path: str, tree: Any):
  """Save a pytree (arrays -> npz, structure -> pickled aux)."""
  leaves, treedef = jax.tree_util.tree_flatten(tree)
  arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)
            if hasattr(x, "shape")}
  others = {i: x for i, x in enumerate(leaves) if not hasattr(x, "shape")}
  os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
  with open(path, "wb") as f:
    pickle.dump({"treedef": treedef, "others": others,
                 "n_leaves": len(leaves)}, f)
    np.savez_compressed(f, **arrays)


def load_checkpoint(path: str) -> Any:
  with open(path, "rb") as f:
    meta = pickle.load(f)
    arrays = np.load(f, allow_pickle=False)
    leaves = []
    for i in range(meta["n_leaves"]):
      if i in meta["others"]:
        leaves.append(meta["others"][i])
      else:
        leaves.append(arrays[f"leaf_{i}"])
  return jax.tree_util.tree_unflatten(meta["treedef"], leaves)


def save_orbax(path: str, tree: Any):
  """Orbax checkpoint (async-capable, multi-host ready)."""
  import orbax.checkpoint as ocp
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(os.path.abspath(path), tree, force=True)
  ckptr.wait_until_finished()


def load_orbax(path: str, target: Any = None) -> Any:
  import orbax.checkpoint as ocp
  ckptr = ocp.StandardCheckpointer()
  return ckptr.restore(os.path.abspath(path), target)
