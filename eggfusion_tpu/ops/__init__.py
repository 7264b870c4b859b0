# Submodules are imported lazily by consumers to keep startup light and
# avoid import cycles: eggfusion_tpu.ops.{image,pyramid,reduce,fusion,raster_xla,raster_pallas}
