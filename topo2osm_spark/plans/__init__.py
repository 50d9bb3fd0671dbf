"""Plan composition: session config + the end-to-end conversion pipeline."""
