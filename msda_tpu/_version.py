"""Single source of truth for the package version.

``pyproject.toml`` reads this file through hatchling's dynamic-version
hook, and ``msda_tpu.__init__`` falls back to it for in-tree (uninstalled)
use — so the version can never disagree between the wheel metadata and the
importable package.
"""

__version__ = "0.4.0"
