"""Package hygiene: every annotation in every module must resolve.

Round-1 shipped a latent NameError — ``Optional[float]`` in
models/vgg_osvos.py without the import, masked at runtime by
``from __future__ import annotations`` but fatal to any
``typing.get_type_hints``-based tooling. This walks the whole package and
resolves every class/function/method annotation so the bug class can't
recur.
"""

import importlib
import inspect
import pkgutil
import typing

import osvos_tpu


def _iter_modules():
    yield osvos_tpu
    for info in pkgutil.walk_packages(osvos_tpu.__path__, "osvos_tpu."):
        yield importlib.import_module(info.name)


def test_all_annotations_resolve():
    checked = 0
    for mod in _iter_modules():
        for name, obj in list(vars(mod).items()):
            if getattr(obj, "__module__", None) != mod.__name__:
                continue
            if inspect.isclass(obj):
                typing.get_type_hints(obj)
                checked += 1
                for mname, meth in inspect.getmembers(obj, inspect.isfunction):
                    if meth.__module__ == mod.__name__:
                        typing.get_type_hints(meth)
                        checked += 1
            elif inspect.isfunction(obj):
                typing.get_type_hints(obj)
                checked += 1
    assert checked > 50, f"walked too little of the package ({checked})"
