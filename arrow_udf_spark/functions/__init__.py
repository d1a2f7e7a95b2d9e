"""Built-in function corpus; importing this package registers everything
into the global registry (analogue of the reference's linkme distributed
slice, arrow-udf/src/sig.rs:114-127)."""

from . import corpus  # noqa: F401
