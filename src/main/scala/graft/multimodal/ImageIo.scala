package graft.multimodal

/** Process-wide ImageIO configuration, flipped at first decode on every
  * JVM that touches a codec: ImageIO's default InputStream path spools
  * each decode through a TEMP-FILE cache — one file create/write/delete
  * per decoded image/frame — and for byte-array payloads the in-memory
  * cache is strictly better. Every ImageIO-using decode path (GIF, PNG,
  * JPEG, AVI) references this lazy val, so the switch does not depend on
  * which query happens to run first in the JVM. */
private[multimodal] object ImageIo {
  lazy val noDiskCache: Unit = javax.imageio.ImageIO.setUseCache(false)
}
