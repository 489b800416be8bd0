"""Transformer vault: named numpy-expression presets.

Reference-compatible names and expressions (the feature names a vault
produces — e.g. ``f3_tr_sqrt`` — are part of the output contract, so
the strings must match the reference vault:
``feature_transformer_vault/default_transformers.py:4-52``,
``fw_transformers.py:8-33``).  The fw grid (4 resolutions x 8
thresholds x {sqrt, log} x {int, prob} + the 10 defaults = 138) is
generated, not enumerated, exactly like the reference builds it.

All expressions compile through ``expr_vault.parse_expr`` — they are
data, validated against the whitelist grammar before any execution.
"""
from __future__ import annotations

import json
import os

__all__ = [
    "MINIMAL_TRANSFORMERS", "DEFAULT_TRANSFORMERS",
    "EXTENDED_TRANSFORMERS", "EXTENDED_ROUNDED_TRANSFORMERS",
    "FW_TRANSFORMERS", "resolve_preset",
]

MINIMAL_TRANSFORMERS = {
    "_tr_sqrt": "np.sqrt(X)",
    "_tr_log(x+1)": "np.log(X + 1)",
    "_tr_sqrt(abs(x))": "np.sqrt(np.abs(X))",
    "_tr_log(abs(x)+1)": "np.log(np.abs(X) + 1)",
}

DEFAULT_TRANSFORMERS = {
    **MINIMAL_TRANSFORMERS,
    "_tr_div(x,abs(x))*log(abs(x))": "np.divide(X, np.abs(X)) * np.log(np.abs(X))",
    "_tr_log(x + sqrt(pow(x,2), 1)": "np.log(X + np.sqrt(np.power(X, 2) + 1))",
    "_tr_log*sqrt": "np.log(X + 1) * np.sqrt(X)",
    "_tr_log*100": "np.round(np.log(X + 1) * 100, 0)",
    "_tr_nonzero": "np.where(X != 0, 1, 0)",
    "_tr_round(div(x,max))": "np.round(np.divide(X, np.max(X)), 0)",
}

EXTENDED_TRANSFORMERS = {
    **DEFAULT_TRANSFORMERS,
    "_tr_squared": "np.square(X)",
    "_tr_cubed": "np.power(X, 3)",
    "_tr_inverse": "np.divide(1, X, out=np.zeros_like(X), where=X!=0)",
    "_tr_exp": "np.exp(X)",
    "_tr_exp_minus_1": "np.expm1(X)",
    "_tr_sin": "np.sin(X)",
    "_tr_cos": "np.cos(X)",
    "_tr_tan": "np.tan(X)",
    "_tr_arcsin_safe": "np.arcsin(np.clip(X, -1, 1))",
    "_tr_arccos_safe": "np.arccos(np.clip(X, -1, 1))",
    "_tr_arctan": "np.arctan(X)",
    "_tr_sign": "np.sign(X)",
    "_tr_z_score": "(X - np.mean(X)) / np.std(X)",
    "_tr_min_max_scale": "(X - np.min(X)) / (np.max(X) - np.min(X))",
    "_tr_quadratic_root": "np.cbrt(X)",
    "_tr_shifted_sigmoid": "1 / (1 + np.exp(-X - 0.5))",
    "_tr_logistic": "1 / (1 + np.exp(-X))",
}

EXTENDED_ROUNDED_TRANSFORMERS = {
    f"{name}_rounded_{k}": f"np.round({expr}, {k})"
    for name, expr in EXTENDED_TRANSFORMERS.items()
    for k in range(1, 5)
}


def _fw_grid() -> dict[str, str]:
    out = dict(DEFAULT_TRANSFORMERS)
    resolutions = [1, 10, 50, 100]
    thresholds = [1, 2, 4, 8, 16, 32, 64, 96]
    for res in resolutions:
        for gt in thresholds:
            out[f"_tr_fw_sqrt_res_{res}_gt_{gt}"] = (
                f"np.where(X < {gt}, X, np.where(X>{gt} ,"
                f"np.round(np.sqrt(X-{gt})*{res},0), 0))"
            )
            out[f"_tr_fw_log_res_{res}_gt_{gt}"] = (
                f"np.where(X <{gt}, X, np.where(X >{gt}, "
                f"np.round(np.log(X-{gt})*{res},0), 0))"
            )
    for res in resolutions:
        for gt in [t / 100 for t in thresholds]:
            out[f"_tr_fw_prob_sqrt_res_{res}_gt_{gt}"] = (
                f"np.where(X < {gt}, X, np.where(X>{gt}, "
                f"np.round(np.sqrt(X-{gt})*{res},0), 0))"
            )
            out[f"_tr_fw_prob_log_res_{res}_gt_{gt}"] = (
                f"np.where(X <{gt},X, np.where(X>{gt}, "
                f"np.round(np.log(X-{gt})*{res},0), 0))"
            )
    return out


FW_TRANSFORMERS = _fw_grid()

_PRESETS = {
    "minimal": MINIMAL_TRANSFORMERS,
    "default": DEFAULT_TRANSFORMERS,
    "extended": EXTENDED_TRANSFORMERS,
    "extended_rounded": EXTENDED_ROUNDED_TRANSFORMERS,
    "fw-transformers": FW_TRANSFORMERS,
}


def resolve_preset(preset: str) -> dict[str, str]:
    """Resolve a comma-separated preset spec — named vaults and/or
    JSON file paths ({name: expression}) — into one transformer dict
    (mirrors ranking_transformers.py:75-137 incl. validation)."""
    collection: dict[str, str] = {}
    for ns in preset.split(","):
        ns = ns.strip()
        if ns.endswith(".json"):
            if not os.path.isfile(ns):
                raise FileNotFoundError(f"Transformer JSON file not found: {ns}")
            with open(ns) as f:
                loaded = json.load(f)
            if not isinstance(loaded, dict):
                raise ValueError(f"{ns} must contain a dict of expressions")
            for k, v in loaded.items():
                if not isinstance(v, str):
                    raise ValueError(
                        f"Transformer {k!r} in {ns} must map to a string "
                        f"expression, got {type(v)}",
                    )
            collection.update(loaded)
        elif ns in _PRESETS:
            collection.update(_PRESETS[ns])
    if not collection:
        raise NotImplementedError(
            "Please specify valid transformer namespaces (minimal, "
            "default, extended, extended_rounded, fw-transformers) or a "
            "JSON file path.",
        )
    return collection
