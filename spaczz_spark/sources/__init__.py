"""Sources: corpus synthesis and the checkpoint catalog."""
