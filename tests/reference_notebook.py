"""Load the reference AttFind notebook's *literal source* as a test oracle.

VERDICT r2 "Missing #1": per-op parity and delta==bias-mutation were proven,
but the reference's actual phase-2 loop + greedy analysis
(`/root/reference/stylex/run_attfind_combined.ipynb` cells 5, 15, 16) were
never composed end-to-end against ``stylex_tpu.attfind``. Like
``reference_src.py``, this module AST-extracts the notebook's own function
definitions and execs them, so the ranking-parity test binds to the
reference's code rather than to a re-typing of it.

Extracted:
* cell 5 — ``sindex_to_block_idx_and_index``, ``get_min_max_style_vectors``,
  ``discriminator_filter``, ``attfind_extraction`` (the bias-mutation hot
  loop, run verbatim with ``torch.Tensor.cuda`` patched to a no-op since
  this image has no GPU),
* cell 15 — ``find_significant_styles`` (greedy top-k, pure numpy),
* cell 16 — the class merge + scoring script, exec'd with its expected
  globals injected.

The loop hard-codes ``latent_dim == 514`` (``torch.zeros((num_images,
514))``), so oracle models must use the reference's real 514/512 dims.
"""

from __future__ import annotations

import ast
import contextlib
import json
import math
import multiprocessing
import os
from functools import lru_cache
from pathlib import Path

import h5py
import numpy as np
import torch
import torch.nn.functional as F

from reference_src import load_reference_namespace

NOTEBOOK_PATH = Path("/root/reference/stylex/run_attfind_combined.ipynb")

_CELL5_WANTED = (
    "NUM_CORES",
    "load_hdf5_results",
    "sindex_to_block_idx_and_index",
    "get_min_max_style_vectors",
    "discriminator_filter",
    "attfind_extraction",
)
_CELL15_WANTED = ("find_significant_styles",)


class _NoTqdm:
    """tqdm stand-in (quiet; tqdm itself is present but noisy under pytest)."""

    @staticmethod
    def tqdm(it, *a, **k):
        return it


def _extract(source: str, wanted, filename: str) -> list:
    tree = ast.parse(source)
    keep = []
    for node in tree.body:
        if isinstance(node, (ast.ClassDef, ast.FunctionDef)) and node.name in wanted:
            keep.append(node)
        elif isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id in wanted for t in node.targets
        ):
            keep.append(node)
    found = {n.name for n in keep if isinstance(n, (ast.ClassDef, ast.FunctionDef))}
    found |= {
        t.id
        for n in keep
        if isinstance(n, ast.Assign)
        for t in n.targets
        if isinstance(t, ast.Name)
    }
    missing = set(wanted) - found
    assert not missing, f"{filename} did not contain: {sorted(missing)}"
    return keep


def _cell_source(idx: int) -> str:
    nb = json.loads(NOTEBOOK_PATH.read_text())
    return "".join(nb["cells"][idx]["source"])


@lru_cache(maxsize=1)
def load_notebook_namespace(use_old_architecture: bool = True) -> dict:
    """Exec the wanted notebook defs; returns their namespace."""
    ref_ns = load_reference_namespace()
    ns = {
        "torch": torch,
        "F": F,
        "np": np,
        "h5py": h5py,
        "os": os,
        "math": math,
        "multiprocessing": multiprocessing,
        "tqdm": _NoTqdm,
        "USE_OLD_ARCHITECTURE": use_old_architecture,
        "styles_def_to_tensor": ref_ns["styles_def_to_tensor"],
    }
    body = _extract(_cell_source(5), _CELL5_WANTED, "notebook cell 5")
    body += _extract(_cell_source(15), _CELL15_WANTED, "notebook cell 15")
    module = ast.Module(body=body, type_ignores=[])
    code = compile(module, filename=str(NOTEBOOK_PATH), mode="exec")
    exec(code, ns)
    return ns


@contextlib.contextmanager
def fake_cuda():
    """The notebook calls ``.cuda(rank)`` on every tensor; no GPU here."""
    orig = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda = orig


def run_reference_attfind(
    stylex: torch.nn.Module,
    classifier,
    images: list,
    noise: torch.Tensor,
    num_style_coords: int,
    results_folder: str,
    shift_size: float = 1.0,
    image_size: int = 64,
):
    """Drive the notebook's literal ``attfind_extraction`` (cell 5 hot loop)
    and return the ``style_change_records.hdf5`` contents it wrote."""
    ns = load_notebook_namespace()
    with fake_cuda(), torch.no_grad():
        ns["attfind_extraction"](
            dataloader=iter(images),
            num_images=len(images),
            results_folder=results_folder,
            stylex=stylex,
            classifier=classifier,
            dataset_name=None,
            noise=noise,
            num_style_coords=num_style_coords,
            shift_size=shift_size,
            # the cell's discriminator_filter only returns the (skip, score)
            # tuple when a threshold is given (the notebook always sets one,
            # cell 7); use_discriminator=False ignores the skip flag anyway
            discriminator_threshold=-1e9,
            image_size=image_size,
            batch_size=1,
            cuda_rank=0,
            use_discriminator=False,
        )
    out = {}
    with h5py.File(os.path.join(results_folder, "style_change_records.hdf5"), "r") as f:
        for k in f.keys():
            out[k] = np.array(f[k])
    return out


def run_reference_analysis(
    style_change_effect: np.ndarray,
    base_probs: np.ndarray,
    latents: np.ndarray,
    num_indices: int,
    effect_threshold: float = 0.5,
):
    """Exec the notebook's analysis cells 14 + 16 (class split, greedy picks
    per class, merge + scoring) with their expected globals injected;
    returns the final ranked ``s_indices_and_signs`` list."""
    ns = load_notebook_namespace()

    # cell 14 (inline script): split by argmax class
    all_labels = np.argmax(base_probs, axis=1)
    style_effect_classes = {}
    W_classes = {}
    for img_ind in range(2):
        img_inx = np.array(
            [i for i in range(all_labels.shape[0]) if all_labels[i] == img_ind],
            dtype=int,
        )
        style_effect_classes[img_ind] = style_change_effect[img_inx]
        W_classes[img_ind] = latents[img_inx]

    cell16_globals = {
        "np": np,
        "find_significant_styles": ns["find_significant_styles"],
        "style_effect_classes": style_effect_classes,
        "W_classes": W_classes,
        "style_change_effect": style_change_effect,
        "stylex": type("S", (), {"G": None})(),
        "classifier": None,
        "style_min": None,
        "style_max": None,
        "num_indices": num_indices,
        "effect_threshold": effect_threshold,
        "print": lambda *a, **k: None,
    }
    src = _cell_source(16)
    # the cell re-binds num_indices / effect_threshold at the top; drop those
    # two literal assignments so the caller's values apply
    lines = [
        l
        for l in src.splitlines()
        if not l.startswith(("num_indices =", "effect_threshold ="))
    ]
    exec(compile("\n".join(lines), str(NOTEBOOK_PATH) + ":cell16", "exec"), cell16_globals)
    return cell16_globals["s_indices_and_signs"]
