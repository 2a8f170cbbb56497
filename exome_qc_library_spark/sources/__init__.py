"""Sources/sinks: table formats, checkpoint store, delimited/interval readers."""
