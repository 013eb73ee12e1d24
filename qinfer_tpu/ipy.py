"""Notebook progress glue (analogue of qinfer's ipy.py).

Reference parity: ``src/qinfer/ipy.py`` — ``IPythonProgressBar``
(ipywidgets progress bar consumed by perf_testing). Degrades to a
console/no-op bar when ipywidgets is unavailable (SURVEY §2.21).
"""

from __future__ import annotations

__all__ = ["IPythonProgressBar"]


class IPythonProgressBar:
    """ipywidgets FloatProgress wrapper with console fallback.

    Reference: ``ipy.py — IPythonProgressBar`` (same interface:
    ``start(max)``, ``update(n)``, ``finished()``, ``description``).
    """

    def __init__(self):
        try:
            import ipywidgets

            self.widget = ipywidgets.FloatProgress(
                value=0.0, min=0.0, max=100.0, description="Progress:"
            )
        except Exception:
            self.widget = None
        self._max = 100.0
        self._value = 0.0

    @property
    def description(self):
        if self.widget is not None:
            return self.widget.description
        return "Progress:"

    @description.setter
    def description(self, value):
        if self.widget is not None:
            self.widget.description = value

    def start(self, max_value):
        self._max = float(max_value)
        self._value = 0.0
        if self.widget is not None:
            self.widget.max = float(max_value)
            try:
                from IPython.display import display

                display(self.widget)
            except Exception:
                pass

    def update(self, n):
        self._value = float(n)
        if self.widget is not None:
            self.widget.value = float(n)

    def finished(self):
        self.update(self._max)
