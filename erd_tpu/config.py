"""Typed-ish config system: python-file configs, ``_base_`` composition,
dotted CLI overrides.

Replaces mmengine's Config for this framework (SURVEY.md section 5 "Config /
flag system"): config files are plain python modules whose top-level names
become keys; ``_base_`` lists compose by recursive dict merge (child wins);
``--cfg-options a.b.c=v`` deep-overrides, with literal parsing for numbers,
bools, tuples and lists. No registry indirection: builders consume these
dicts explicitly (apis/build.py).
"""
from __future__ import annotations

import ast
import copy
import os
import types
from typing import Any, Dict, List, Optional


class Config(dict):
    """dict with attribute access and deep merge."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, Config):
            return Config({k: Config._wrap(x) for k, x in v.items()})
        if isinstance(v, list):
            return [Config._wrap(x) for x in v]
        return v

    # ------------------------------------------------------------------
    @classmethod
    def fromfile(cls, path: str) -> 'Config':
        path = os.path.abspath(path)
        module_vars = cls._exec_file(path)
        bases = module_vars.pop('_base_', [])
        if isinstance(bases, str):
            bases = [bases]
        merged: Dict[str, Any] = {}
        for b in bases:
            base_cfg = cls.fromfile(os.path.join(os.path.dirname(path), b))
            merged = cls._merge(merged, base_cfg)
        merged = cls._merge(merged, module_vars)
        return cls._wrap(merged)

    @staticmethod
    def _exec_file(path: str) -> Dict[str, Any]:
        with open(path) as f:
            src = f.read()
        mod = types.ModuleType('cfg')
        mod.__file__ = path
        exec(compile(src, path, 'exec'), mod.__dict__)
        return {k: v for k, v in vars(mod).items()
                if not k.startswith('__')}

    @staticmethod
    def _merge(base: Dict, override: Dict) -> Dict:
        out = copy.deepcopy(dict(base))
        for k, v in override.items():
            if isinstance(v, dict) and v.get('_delete_', False) is True:
                out[k] = copy.deepcopy(
                    {k2: x for k2, x in v.items() if k2 != '_delete_'})
            elif (k in out and isinstance(out[k], dict)
                  and isinstance(v, dict)):
                out[k] = Config._merge(out[k], v)
            else:
                out[k] = copy.deepcopy(v)
        return out

    # ------------------------------------------------------------------
    def merge_from_options(self, options: Dict[str, str],
                           strict: bool = False) -> 'Config':
        """Apply {'a.b.c': 'value'} overrides (values parsed as literals).

        With ``strict=True`` (the CLI tools' mode) bad overrides fail fast
        with the offending dotted path named: traversing a non-dict,
        setting a key that does not exist (prefix the option with ``+`` to
        create one deliberately, e.g. ``+model.new_knob=1``), or replacing
        a value with an incompatible type all raise instead of surfacing
        as a distant TypeError inside a builder.
        """
        for key, raw in options.items():
            allow_new = key.startswith('+')
            key_clean = key[1:] if allow_new else key
            value = _parse_value(raw)
            node = self
            parts = key_clean.split('.')
            for i, p in enumerate(parts[:-1]):
                here = '.'.join(parts[:i + 1])
                if p in node and not isinstance(node[p], dict):
                    raise TypeError(
                        f"--cfg-options: '{here}' is a "
                        f'{type(node[p]).__name__}, not a config section')
                if p not in node:
                    if strict and not allow_new:
                        raise KeyError(
                            f"--cfg-options: unknown section '{here}'"
                            + _suggest(node, p))
                    node[p] = Config()
                node = node[p]
            leaf = parts[-1]
            if strict and not allow_new and leaf not in node:
                raise KeyError(
                    f"--cfg-options: unknown key '{key_clean}'"
                    + _suggest(node, leaf))
            if strict and leaf in node:
                _check_type(key_clean, node[leaf], value)
            node[leaf] = Config._wrap(value)
        return self

    def dump(self) -> str:
        import json

        def enc(v):
            if isinstance(v, dict):
                return {k: enc(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [enc(x) for x in v]
            if isinstance(v, (int, float, str, bool, type(None))):
                return v
            return repr(v)

        return json.dumps(enc(self), indent=2)


def _suggest(node, key):
    import difflib
    close = difflib.get_close_matches(key, [str(k) for k in node], n=3)
    return f" (did you mean: {', '.join(close)}?)" if close else \
        ' (prefix with + to create a new key)'


_COMPAT = (
    {int, float, bool},      # numeric-ish scalars interchange
    {tuple, list},
)


def _check_type(path, old, new):
    if old is None or new is None:
        return
    to, tn = type(old), type(new)
    if to is tn or isinstance(old, dict) and isinstance(new, dict):
        return
    for group in _COMPAT:
        if to in group and tn in group:
            return
    raise TypeError(
        f"--cfg-options: '{path}' expects {to.__name__} "
        f'(current value {old!r}), got {tn.__name__} {new!r}')


def _parse_value(raw):
    if not isinstance(raw, str):
        return raw
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw


def parse_cfg_options(pairs: List[str]) -> Dict[str, str]:
    """['a.b=1', 'c=x'] -> {'a.b': '1', 'c': 'x'}."""
    out = {}
    for pair in pairs or []:
        k, _, v = pair.partition('=')
        out[k.strip()] = v
    return out
