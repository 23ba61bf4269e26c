"""Sinks: staged atomic publish to lake formats, error side-outputs,
console/memory debug sinks — the DataWriter/DataPublisher surface."""
