package graft.multimodal

/** JVM-wide ImageIO stream tuning, applied once before any codec
  * call: by default `ImageIO.read`/`createImageOutputStream` back
  * every stream with a TEMP FILE (FileCacheImage*Stream) — for the
  * per-frame JPEG/PNG calls of the media pipelines that means a
  * create+write+delete of a disk file per frame, thousands per task
  * batch, all contending on the temp directory. Frames here are KBs,
  * so the memory-cached stream is strictly better (measured on
  * mm_video_mjpg at sf0.1: 9.3 s → see SCALE.md).
  * Same class of fix as WavCodec's lock-free RIFF path (r4): JVM
  * media statics are cluster-wide serialization points. */
private[multimodal] object ImageIoTuning {
  lazy val applied: Unit = javax.imageio.ImageIO.setUseCache(false)
}
