"""Hierarchical YAML config with ``_parent_`` inheritance + dotted CLI overrides.

Replicates the reference options system behaviors (options.py:17-152):
  * multi-level ``_parent_`` YAML chains with child-over-parent dict merge;
  * dotted CLI keys: ``--a.b.c=value`` (yaml-typed), ``--flag`` (true),
    ``--flag!`` (false);
  * unknown-key safety check (non-interactive: raises unless the key is
    marked new with ``+`` or ``allow_new=True``);
  * seeding and run naming are handled by the caller (train CLI).

Unlike the reference's implicit hasattr-schema, every lookup supports an
explicit default via ``opt.get("a.b.c", default)``.
"""
from __future__ import annotations

import os
from typing import Any

import yaml


class Options(dict):
    """dict with attribute access and recursive wrapping."""

    def __init__(self, d: dict | None = None, **kwargs):
        super().__init__()
        merged = dict(d or {})
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = _wrap(v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = _wrap(v)

    def __delattr__(self, k):
        del self[k]

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            else:
                return default
        return node

    def set_path(self, dotted: str, value: Any, allow_new: bool = False):
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], dict):
                if not allow_new and part not in node:
                    raise KeyError(
                        f"unknown config group {part!r} in {dotted!r} "
                        f"(prefix with + to create new keys)"
                    )
                node[part] = Options()
            node = node[part]
        leaf = parts[-1]
        if not allow_new and leaf not in node:
            raise KeyError(
                f"unknown config key {dotted!r} (prefix with + to create new keys)"
            )
        node[leaf] = _wrap(value)

    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, Options) else v) for k, v in self.items()
        }


def _wrap(v):
    if isinstance(v, Options):
        return v
    if isinstance(v, dict):
        return Options(v)
    if isinstance(v, list):
        return [_wrap(x) for x in v]
    return v


def _merge(parent: dict, child: dict) -> dict:
    """Child-over-parent recursive merge (reference options.py:72-85)."""
    out = dict(parent)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_options(yaml_path: str) -> Options:
    """Load a YAML file, resolving its ``_parent_`` chain."""
    with open(yaml_path) as f:
        raw = yaml.safe_load(f) or {}
    parent = raw.pop("_parent_", None)
    if parent is not None:
        if not os.path.isabs(parent):
            # parents are given relative to the repo root (like the reference's
            # "options/base.yaml"); also try relative to the child file
            cand = [parent, os.path.join(os.path.dirname(yaml_path), parent),
                    os.path.join(os.path.dirname(yaml_path), os.path.basename(parent))]
        else:
            cand = [parent]
        for c in cand:
            if os.path.exists(c):
                parent_opt = load_options(c).to_dict()
                raw = _merge(parent_opt, raw)
                break
        else:
            raise FileNotFoundError(f"_parent_ yaml not found: {parent}")
    return Options(raw)


def parse_arguments(argv: list[str]) -> Options:
    """Parse ``--key=value`` / ``--flag`` / ``--flag!`` CLI args into an Options."""
    out = Options()
    for arg in argv:
        assert arg.startswith("--"), f"bad argument {arg!r} (expected --key=value)"
        body = arg[2:]
        if "=" not in body:
            if body.endswith("!"):
                key, value = body[:-1], False
            else:
                key, value = body, True
        else:
            key, raw = body.split("=", 1)
            value = yaml.safe_load(raw)
        allow_new = key.startswith("+")
        out.set_path(key.lstrip("+"), value, allow_new=True)
        if allow_new:
            out.setdefault("_new_keys_", []).append(key.lstrip("+"))
    return out


def override_options(opt: Options, overrides: Options, allow_new_keys=()):
    """Apply dotted overrides onto a loaded config with unknown-key checking."""
    new_keys = set(overrides.pop("_new_keys_", []))
    new_keys.update(allow_new_keys)

    def apply(prefix: str, node: dict):
        for k, v in node.items():
            dotted = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict) and opt.get_path(dotted) is not None and not (
                dotted in new_keys
            ):
                apply(dotted, v)
            else:
                allow = any(
                    nk == dotted
                    or nk.startswith(dotted + ".")
                    or dotted.startswith(nk + ".")
                    for nk in new_keys
                )
                opt.set_path(dotted, v, allow_new=allow)

    apply("", overrides)
    return opt


def set_options(yaml_path: str, argv: list[str] = (), allow_new_keys=()) -> Options:
    """load + override in one call (the reference's options.set)."""
    opt = load_options(yaml_path)
    cli = parse_arguments(list(argv))
    return override_options(opt, cli, allow_new_keys=allow_new_keys)


def diff_options(old: dict, new: dict, prefix: str = "") -> list[str]:
    """Dotted-key differences between two config dicts.

    The reference interactively diffs a run's saved options.yaml against
    the current invocation before overwriting it (options.py:130-152);
    here the drift check is non-interactive: the caller prints the diff
    and proceeds (autonomous TPU jobs cannot prompt)."""
    lines = []
    for k in sorted(set(old) | set(new)):
        dotted = f"{prefix}.{k}" if prefix else str(k)
        if k not in old:
            lines.append(f"+ {dotted} = {new[k]!r}")
        elif k not in new:
            lines.append(f"- {dotted} (was {old[k]!r})")
        elif isinstance(old[k], dict) and isinstance(new[k], dict):
            lines.extend(diff_options(old[k], new[k], dotted))
        elif old[k] != new[k]:
            lines.append(f"~ {dotted}: {old[k]!r} -> {new[k]!r}")
    return lines
