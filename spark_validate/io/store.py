"""Fitted-state store — load-or-fit-and-store (reference pattern:
`nannyml/io/store/file_store.py:16-139`, `nannyml/runner.py:169-202`).

The reference pickles whole calculator objects with joblib; we persist plain
JSON state dicts (safe, versionable, engine-agnostic) keyed by check name.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional


class StateNotSerializable(ValueError):
    """Raised by a calculator's ``get_state`` when its fitted state is
    legitimately not JSON-persistable (e.g. a high-cardinality seen-set with
    no ``manifest_dir`` configured). The runner warns and continues with the
    fitted calculator for THIS exception only — a plain ``ValueError`` from
    a buggy ``get_state`` still surfaces instead of silently disabling
    load-or-fit."""


class FittedStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        safe = key.replace("/", "_")
        return os.path.join(self.root, f"{safe}.json")

    def save(self, key: str, state: dict) -> None:
        tmp = self._path(key) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._path(key))  # atomic publish

    def load(self, key: str) -> Optional[dict]:
        p = self._path(key)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def load_or_fit(self, key: str, calculator, fit: Callable):
        """Restore fitted state if present; otherwise run ``fit`` and persist.

        The reference's FilesystemStore load-or-fit contract
        (`nannyml/runner.py:169-202`)."""
        state = self.load(key)
        if state is not None:
            calculator.set_state(state)
            return calculator, True
        fit()
        self.save(key, calculator.get_state())
        return calculator, False
