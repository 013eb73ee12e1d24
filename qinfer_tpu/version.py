"""Version metadata. Reference: ``src/qinfer/version.py``."""

__version__ = "0.3.0"
version = __version__
