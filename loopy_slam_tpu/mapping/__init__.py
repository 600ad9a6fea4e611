"""Map state (neural point cloud), tracking and mapping optimization steps."""
