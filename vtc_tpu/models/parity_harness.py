"""Layer-wise activation-diff harness: torch CLIP <-> vtc_tpu CLIP.

The checkpoint-parity target (BASELINE.md: fp32 tolerance vs PyTorch
checkpoints) needs more than an end-to-end allclose when something drifts —
this harness localizes divergence per block. It runs both implementations on
the same input, captures per-block activations (flax
``capture_intermediates``; torch forward hooks), aligns them by block index,
and reports max-abs diffs.

Usage::

    report = compare_clip_activations(torch_model, jax_model, variables,
                                      images, tokens)
    print(format_report(report))

``torch_model`` is any module exposing HF CLIPModel structure
(``vision_model.encoder.layers[i]`` / ``text_model.encoder.layers[i]``) —
the random-weight parity tests use a small HF twin; with provisioned openai
weights the same harness pinpoints any import mismatch.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def _jax_block_outputs(jax_model, variables, images, tokens):
    """-> {('visual'|'text', i): np.ndarray} block outputs + final embeds."""
    out, state = jax_model.apply(
        variables,
        jnp.asarray(images),
        jnp.asarray(tokens),
        capture_intermediates=True,
    )
    inter = state["intermediates"]
    captured: Dict = {}

    def visit(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                visit(v, path + (k,))
        elif path and path[-1] == "__call__":
            captured["/".join(path[:-1])] = tree[0]

    visit(inter, ())

    result: Dict = {}
    for name, val in captured.items():
        parts = name.split("/")
        for p in parts:
            if p.startswith("resblocks_"):
                idx = int(p.split("_")[-1])
                tower = "visual" if "visual" in parts else "text"
                key = (tower, idx)
                # keep the outermost (block-level) capture
                if key not in result or len(parts) == parts.index(p) + 1:
                    if parts[-1] == p:
                        result[key] = np.asarray(val, np.float32)
    result[("visual", "embed")] = np.asarray(out[0], np.float32)
    result[("text", "embed")] = np.asarray(out[1], np.float32)
    return result


def _torch_block_outputs(torch_model, images, tokens):
    import torch

    captured: Dict = {}

    def hook(key):
        def fn(mod, args, output):
            out = output[0] if isinstance(output, tuple) else output
            captured[key] = out.detach().float().numpy()

        return fn

    handles = []
    for i, layer in enumerate(torch_model.vision_model.encoder.layers):
        handles.append(layer.register_forward_hook(hook(("visual", i))))
    for i, layer in enumerate(torch_model.text_model.encoder.layers):
        handles.append(layer.register_forward_hook(hook(("text", i))))
    try:
        with torch.no_grad():
            img = torch_model.get_image_features(
                pixel_values=torch.from_numpy(np.asarray(images))
            )
            txt = torch_model.get_text_features(
                input_ids=torch.from_numpy(np.asarray(tokens)).long()
            )
    finally:
        for h in handles:
            h.remove()
    captured[("visual", "embed")] = img.numpy()
    captured[("text", "embed")] = txt.numpy()
    return captured


def compare_clip_activations(torch_model, jax_model, variables, images, tokens):
    """-> {key: {"max_abs": float, "max_rel": float}} per aligned block."""
    ours = _jax_block_outputs(jax_model, variables, images, tokens)
    theirs = _torch_block_outputs(torch_model, images, tokens)

    report = {}
    for key in sorted(set(ours) & set(theirs), key=str):
        a, b = ours[key], theirs[key]
        if a.shape != b.shape:
            report[key] = {"shape_ours": a.shape, "shape_theirs": b.shape}
            continue
        diff = np.abs(a - b)
        scale = np.maximum(np.abs(b), 1e-6)
        report[key] = {
            "max_abs": float(diff.max()),
            "max_rel": float((diff / scale).max()),
        }
    return report


def format_report(report) -> str:
    lines = [f"{'layer':<20} {'max_abs':>12} {'max_rel':>12}"]
    for key, stats in report.items():
        name = f"{key[0]}.{key[1]}"
        if "max_abs" in stats:
            lines.append(
                f"{name:<20} {stats['max_abs']:>12.3e} {stats['max_rel']:>12.3e}"
            )
        else:
            lines.append(f"{name:<20} SHAPE MISMATCH {stats}")
    return "\n".join(lines)
