"""Column-expression library: every scalar transform is a native Catalyst
expression (no Python UDFs on hot paths — SURVEY.md §2.11 policy)."""
