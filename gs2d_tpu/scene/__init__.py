"""Scene layer: cameras, dataset readers, PLY IO."""
