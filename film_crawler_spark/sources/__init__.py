"""Sources: seed scans, synthetic site resolver, TableIO commit layer."""
