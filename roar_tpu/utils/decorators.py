"""API-lifecycle decorators.

Re-design of roar/utils/decorators/{deprecated,experimental}.py: wrap
callables or classes with a once-per-symbol warning.  `@deprecated` takes
optional version/explanation text; `@experimental` marks unstable APIs.
"""

from __future__ import annotations

import functools
from typing import Optional

from roar_tpu.utils.logging import get_logger

logging = get_logger()

_warned: set = set()


def _warn_once(key: str, message: str) -> None:
    if key not in _warned:
        _warned.add(key)
        logging.warning(message)


def deprecated(wrapped=None, version: Optional[str] = None, explanation: Optional[str] = None):
    """Mark a function/class deprecated; logs one warning on first use."""
    if wrapped is None:
        return functools.partial(deprecated, version=version, explanation=explanation)

    msg = f"{wrapped.__name__} is deprecated."
    if version:
        msg += f" It is going to be removed in version {version}."
    if explanation:
        msg += f" {explanation}"

    if isinstance(wrapped, type):
        orig_init = wrapped.__init__

        @functools.wraps(orig_init)
        def init(self, *args, **kwargs):
            _warn_once(wrapped.__qualname__, msg)
            orig_init(self, *args, **kwargs)

        wrapped.__init__ = init
        return wrapped

    @functools.wraps(wrapped)
    def wrapper(*args, **kwargs):
        _warn_once(wrapped.__qualname__, msg)
        return wrapped(*args, **kwargs)

    return wrapper


def experimental(wrapped):
    """Mark a function/class experimental; logs one warning on first use."""
    msg = (
        f"{wrapped.__name__} is experimental and everything about it is "
        "subject to change."
    )
    if isinstance(wrapped, type):
        orig_init = wrapped.__init__

        @functools.wraps(orig_init)
        def init(self, *args, **kwargs):
            _warn_once(wrapped.__qualname__, msg)
            orig_init(self, *args, **kwargs)

        wrapped.__init__ = init
        return wrapped

    @functools.wraps(wrapped)
    def wrapper(*args, **kwargs):
        _warn_once(wrapped.__qualname__, msg)
        return wrapped(*args, **kwargs)

    return wrapper
