"""Sources: parquet/CSV scans, the synthetic chain generator (test infra),
and the JSON-RPC fetch source (stubbed — no node in the harness)."""
