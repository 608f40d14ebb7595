from thermal3d.viz.panels import (
    log_sample_images,
    log_sample_images_with_edges,
    save_comparison_panel,
    visualize_data,
    visualize_depth_result,
    visualize_ir,
    overlay_rgb_thermal,
    plot_point_cloud,
)
