"""Python-file configuration system.

Capability parity with the reference's vendored mmengine Config
(/root/reference/cra5/utils/config.py:434 ``fromfile``, :1203 ``_base_``
inheritance, :634 predefined-var substitution, :693 env-var substitution)
but re-designed as a small, dependency-free loader: a config is an ordinary
Python module executed in an isolated namespace; ``_base_`` lists parent
config files merged recursively (child wins); ``{{fileDirname}}`` and
``{{$VAR:default}}`` placeholders are substituted in string values.
"""

from __future__ import annotations

import copy
import os
import re
import types
from typing import Any, Dict, Iterator, List, Mapping


class ConfigDict(dict):
    """dict with attribute access, recursively applied."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict) and not isinstance(value, ConfigDict):
            return ConfigDict({k: ConfigDict._wrap(v) for k, v in value.items()})
        if isinstance(value, (list, tuple)):
            return type(value)(ConfigDict._wrap(v) for v in value)
        return value

    def __deepcopy__(self, memo):
        return ConfigDict({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _merge(base: Dict[str, Any], child: Mapping[str, Any]) -> Dict[str, Any]:
    """Recursive dict merge; child values win. ``_delete_=True`` in a child
    dict replaces the base dict instead of merging into it."""
    out = dict(base)
    for k, v in child.items():
        if (
            isinstance(v, Mapping)
            and isinstance(out.get(k), Mapping)
            and not v.get("_delete_", False)
        ):
            out[k] = _merge(dict(out[k]), v)
        else:
            if isinstance(v, Mapping):
                v = {kk: vv for kk, vv in v.items() if kk != "_delete_"}
            out[k] = v
    return out


_ENV_RE = re.compile(r"\{\{\s*\$(\w+)\s*:\s*([^}]*)\}\}")
_PREDEF_RE = re.compile(r"\{\{\s*(fileDirname|fileBasename|fileBasenameNoExtension|fileExtname)\s*\}\}")


def _substitute(text: str, filename: str) -> str:
    dirname = os.path.dirname(os.path.abspath(filename))
    base = os.path.basename(filename)
    stem, ext = os.path.splitext(base)
    predefined = {
        "fileDirname": dirname,
        "fileBasename": base,
        "fileBasenameNoExtension": stem,
        "fileExtname": ext,
    }
    text = _PREDEF_RE.sub(lambda m: predefined[m.group(1)], text)
    text = _ENV_RE.sub(lambda m: os.environ.get(m.group(1), m.group(2)), text)
    return text


def _exec_config_file(filename: str) -> Dict[str, Any]:
    filename = os.path.abspath(os.path.expanduser(filename))
    if not os.path.isfile(filename):
        raise FileNotFoundError(filename)
    with open(filename, "r") as f:
        source = _substitute(f.read(), filename)
    module = types.ModuleType("_cra5_tpu_config")
    module.__file__ = filename
    code = compile(source, filename, "exec")
    exec(code, module.__dict__)
    cfg = {
        k: v
        for k, v in vars(module).items()
        if not k.startswith("__") and not isinstance(v, (types.ModuleType, types.FunctionType, type))
    }
    return cfg


class Config:
    """A frozen-ish attribute-dict view over a merged config namespace."""

    def __init__(self, cfg_dict: Dict[str, Any] | None = None, filename: str | None = None):
        object.__setattr__(self, "_cfg", ConfigDict._wrap(cfg_dict or {}))
        object.__setattr__(self, "filename", filename)

    @classmethod
    def fromfile(cls, filename: str) -> "Config":
        cfg = _exec_config_file(filename)
        bases = cfg.pop("_base_", [])
        if isinstance(bases, str):
            bases = [bases]
        merged: Dict[str, Any] = {}
        for b in bases:
            if not os.path.isabs(b):
                b = os.path.join(os.path.dirname(os.path.abspath(filename)), b)
            merged = _merge(merged, cls.fromfile(b).to_dict())
        merged = _merge(merged, cfg)
        return cls(merged, filename=filename)

    @classmethod
    def fromdict(cls, d: Mapping[str, Any]) -> "Config":
        return cls(dict(d))

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(dict(self._cfg))

    def get(self, key: str, default: Any = None) -> Any:
        return self._cfg.get(key, default)

    def __getattr__(self, name: str) -> Any:
        try:
            return self._cfg[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __getitem__(self, name: str) -> Any:
        return self._cfg[name]

    def __setitem__(self, name: str, value: Any) -> None:
        self._cfg[name] = ConfigDict._wrap(value)

    def __setattr__(self, name: str, value: Any) -> None:
        self._cfg[name] = ConfigDict._wrap(value)

    def __contains__(self, name: str) -> bool:
        return name in self._cfg

    def __iter__(self) -> Iterator[str]:
        return iter(self._cfg)

    def keys(self) -> List[str]:
        return list(self._cfg.keys())

    def items(self):
        return self._cfg.items()

    def __repr__(self) -> str:
        return f"Config(filename={self.filename!r}, keys={list(self._cfg)})"

    @property
    def pretty_text(self) -> str:
        import pprint

        return pprint.pformat(dict(self._cfg), width=100, sort_dicts=False)

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.pretty_text)
