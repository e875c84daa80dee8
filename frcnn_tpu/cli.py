"""Console entry point (``frcnn-tpu`` after ``pip install``).

Thin shim over the repo-root ``main.py`` driver (the counterpart of the
reference's ``main.lua:218``); installed as a ``[project.scripts]`` entry
so the CLI works from any directory once the package is installed.
"""

from __future__ import annotations


def main(argv=None):
    import main as driver

    return driver.main(argv)


if __name__ == "__main__":
    main()
