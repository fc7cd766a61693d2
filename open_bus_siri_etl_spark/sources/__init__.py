"""Sources and sinks (SURVEY §2.1): snapshot readers and warehouse tables."""
