"""User-facing exception taxonomy.

Mirrors the reference's ``UserException`` usage (validation and
execution errors surfaced to the operator rather than stack traces):
reference src/component.py:38-48,178-185,241-242,296-299 raises
UserException for input-cardinality violations, missing warehouse,
missing PK on upsert, and failed remote statements.
"""


class UserException(Exception):
    """An error caused by user input / job configuration, not a bug."""


class TableExistsError(UserException):
    """Raised by load mode ``error`` when the target table already exists.

    Reference parity: delta-rs default write semantics for mode
    ``error`` (src/component.py:64-68,90-98).
    """


class SchemaMismatchError(UserException):
    """Target and source schemas differ and ``schema_mode != merge``."""
