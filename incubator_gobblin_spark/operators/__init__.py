"""Operator library: each module re-expresses one family from the
reference's operator inventory (SURVEY.md §2) as composable DataFrame
transforms (``DataFrame -> DataFrame`` callables usable with
``df.transform``)."""
