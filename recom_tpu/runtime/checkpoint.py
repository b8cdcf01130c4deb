"""Checkpoint / restore.

The reference persists nothing but its generated-kernel cache (SURVEY.md
section 5: "checkpoint/resume: none" — tables are frozen graph variables).
A complete framework needs both:

  * parameter checkpoints (orbax): the model spec JSON travels with the
    weights, so a saved engine restores standalone
  * the XLA persistent compilation cache (the analogue of the reference's
    MD5-keyed .so cache): enabled per EngineConfig.persistent_compilation_cache
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from recom_tpu.ir.serde import model_from_json, model_to_json
from recom_tpu.ir.spec import ModelSpec


def export_params(engine) -> Dict:
    """Engine device params -> portable {tables: {name: np}, tower: ...}
    pytree (stacked group tables sliced back into per-table arrays)."""
    out: Dict = {"tables": {}, "tower": {}}
    for g in engine.compiled.groups:
        val = engine.device_params["stacked"][str(g.gid)]
        from recom_tpu.ops.quant import QuantizedTable, dequantize_table

        if isinstance(val, QuantizedTable):
            q, s = np.asarray(val.q), np.asarray(val.scale)
            if g.gid in engine._sharded_gids:
                from recom_tpu.parallel.sharded_lookup import unstripe_rows

                m_ax = engine.mesh.shape["model"]
                q, s = unstripe_rows(q, m_ax), unstripe_rows(s, m_ax)
            stacked = dequantize_table(q, s)
        else:
            stacked = np.asarray(val)
        if stacked.ndim == 3:  # Pallas one-hot layout [C_pad, V_pad, d]
            for i, m in enumerate(g.members):
                out["tables"][m.table] = stacked[i, : m.vocab_size].astype(
                    np.float32
                )
            continue
        if g.gid in engine._sharded_gids and not isinstance(
            val, QuantizedTable
        ):  # undo the striped row layout
            from recom_tpu.parallel.sharded_lookup import unstripe_rows

            stacked = unstripe_rows(
                stacked, engine.mesh.shape["model"]
            )
        for m in g.members:
            out["tables"][m.table] = stacked[
                m.row_offset : m.row_offset + m.vocab_size
            ].astype(np.float32)
    for key, layers in engine.device_params["tower"].items():
        out["tower"][key] = [
            {"w": np.asarray(l["w"]), "b": np.asarray(l["b"])}
            for l in layers
        ]
    if getattr(engine, "_fold_emb_perm", False):
        # device stores the first top matmul with emb-perm-folded rows;
        # export back in model order.  Without dedup aliases this is the
        # gather W_m = W_g[perm_full].  With aliases the grouped row holds
        # the SUM of its model rows (non-identifiable split): assign the
        # full sum to the FIRST model slot of each grouped row and zero to
        # the other aliases — re-folding scatter-adds back to W_g exactly
        # (bit-exact resume), and the model-order function is unchanged
        # because aliased slots carry identical activations (x*(w1+w2) +
        # x*0 == the folded product; adding literal 0.0 rows is exact).
        perm_full = engine._fold_perm_full()
        w_g = np.asarray(out["tower"]["top"][0]["w"])
        uniq, first_idx = np.unique(perm_full, return_index=True)
        w_m = np.zeros((len(perm_full),) + w_g.shape[1:], w_g.dtype)
        w_m[first_idx] = w_g[uniq]
        out["tower"]["top"][0]["w"] = w_m
    return out


def save_checkpoint(path: str, engine) -> None:
    """Save spec + params under ``path`` (orbax if available, else npz)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model_spec.json"), "w") as f:
        f.write(model_to_json(engine.model))
    params = export_params(engine)
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(
            os.path.join(os.path.abspath(path), "params"), params, force=True
        )
        ckpt.wait_until_finished()
    except Exception as e:
        # a partially-written params/ dir would shadow the npz fallback at
        # load time (load_checkpoint prefers the orbax branch) — remove it
        # and say what happened instead of failing silently
        import shutil

        shutil.rmtree(os.path.join(path, "params"), ignore_errors=True)
        print(
            f"[recom_tpu.checkpoint] orbax save failed ({e!r}); "
            "falling back to params.npz",
            flush=True,
        )
        flat = {}
        for t, arr in params["tables"].items():
            flat[f"tables/{t}"] = arr
        for key, layers in params["tower"].items():
            for i, l in enumerate(layers):
                flat[f"tower/{key}/{i}/w"] = l["w"]
                flat[f"tower/{key}/{i}/b"] = l["b"]
        np.savez(os.path.join(path, "params.npz"), **flat)


def load_checkpoint(path: str) -> Tuple[ModelSpec, Dict]:
    """Restore (model spec, np params pytree) from ``path``."""
    with open(os.path.join(path, "model_spec.json")) as f:
        model = model_from_json(f.read())
    params_dir = os.path.join(os.path.abspath(path), "params")
    if os.path.exists(params_dir):
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        params = ckpt.restore(params_dir)
        # orbax may return lists as dicts of index keys; normalize tower
        params = _normalize(params)
        return model, params
    npz = np.load(os.path.join(path, "params.npz"))
    params: Dict = {"tables": {}, "tower": {}}
    for key in npz.files:
        kind, rest = key.split("/", 1)
        if kind == "tables":
            # imported TF table names routinely contain '/' (variable
            # scopes) — the WHOLE remainder is the name, not rest.split()[0]
            params["tables"][rest] = npz[key]
        else:
            # "tower/<key>/<layer idx>/<w|b>"; parse the two trailing
            # components from the right so a '/' in the tower key (never
            # produced by our writer, but cheap to tolerate) cannot
            # misalign the unpack
            tk, idx, wb = rest.rsplit("/", 2)
            layers = params["tower"].setdefault(tk, [])
            while len(layers) <= int(idx):
                layers.append({})
            layers[int(idx)][wb] = npz[key]
    return model, params


def _normalize(params):
    """orbax may return the tower LAYER LISTS as digit-keyed dicts; convert
    those back to lists — but only under "tower" (table names could be
    all-numeric strings and must stay dict keys)."""

    def conv(x, listify: bool):
        if isinstance(x, dict):
            keys = list(x.keys())
            if listify and keys and all(str(k).isdigit() for k in keys):
                return [conv(x[k], listify) for k in sorted(keys, key=int)]
            return {k: conv(v, listify) for k, v in x.items()}
        return np.asarray(x)

    params = dict(params)
    return {
        "tables": conv(params.get("tables", {}), listify=False),
        "tower": conv(params.get("tower", {}), listify=True),
    }


def enable_persistent_compilation_cache(cache_dir: str) -> None:
    """Point XLA's persistent compilation cache at ``cache_dir`` (the
    reference's nvcc/MD5 kernel cache analogue for whole XLA programs)."""
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
