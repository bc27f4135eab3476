"""Plans: run configuration and the resumable dedup pipeline DAG."""
