"""Sinks package.

``ManagedTable`` is exported lazily (PEP 562): the streaming
``table_changes_stream`` Python Data Source workers import the light
``sinks.cdf_actions`` module through this package, and an eager
``from .managed_table import ManagedTable`` here dragged the full
table engine (and its transitive imports) into every worker's
cold-start for nothing.
"""

__all__ = ["ManagedTable"]


def __getattr__(name):
    if name == "ManagedTable":
        from component_delta_lake_writer_spark.sinks.managed_table import (
            ManagedTable,
        )

        return ManagedTable
    raise AttributeError(name)
