"""Every module in the package imports cleanly."""
import importlib
import pkgutil

import animateportrait_tpu


def test_all_modules_import():
    pkg = animateportrait_tpu
    failures = []
    for mod in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{mod.name}: {e!r}")
    assert not failures, "\n".join(failures)
