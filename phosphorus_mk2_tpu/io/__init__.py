"""Scene I/O codecs and film output sinks."""
