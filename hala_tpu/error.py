"""Error type for the framework.

Parity: reference src/error.rs (HalaRendererError with cause chaining).
The JAX runtime has no separate gfx-error domain, so one exception class
with an optional cause covers both directions of the reference's
bidirectional From conversions (error.rs:28-42).
"""


class HalaRendererError(Exception):
    """Renderer error with an optional chained cause."""

    def __init__(self, message: str, cause: BaseException | None = None):
        super().__init__(message)
        self.message = message
        if cause is not None:
            self.__cause__ = cause

    def __str__(self) -> str:  # pragma: no cover - trivial
        if self.__cause__ is not None:
            return f"{self.message} (caused by: {self.__cause__!r})"
        return self.message
