"""duecredit stub. Reference: ``src/qinfer/_due.py`` (a no-op shim so the
package works without the optional duecredit dependency)."""


class _InactiveDueCreditCollector:
    def _donothing(self, *args, **kwargs):
        pass

    def dcite(self, *args, **kwargs):
        def decorator(func):
            return func

        return decorator

    cite = load = add = _donothing

    def __repr__(self):
        return f"{self.__class__.__name__}()"


due = _InactiveDueCreditCollector()


def BibTeX(*args, **kwargs):
    pass


def Doi(*args, **kwargs):
    pass
