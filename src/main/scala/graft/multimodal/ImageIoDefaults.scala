package graft.multimodal

/** JVM-wide ImageIO stream-cache configuration for the image kernels.
  *
  * `ImageIO` defaults to `useCache=true`: every
  * `createImageInputStream`/`createImageOutputStream` over a plain
  * `InputStream`/`OutputStream` — which includes every
  * `ImageIO.write(img, fmt, byteArrayStream)` and every
  * `createImageInputStream(new ByteArrayInputStream(...))` — spools
  * through a TEMP FILE on disk (`FileCache*Stream`): one file created,
  * written, read back and deleted PER ROW in the per-row image
  * kernels. At one task that is wasted I/O; at 32 concurrent tasks it
  * is filesystem contention on the temp directory — the m80/m85
  * "faster on 8 cores than 32" signature. Every payload here is an
  * in-memory byte array (bounded, fixture/corpus-cell sized), so the
  * memory-backed cache is strictly better at any scale.
  *
  * The flag is per-JVM; referencing [[ensure]] from an image kernel's
  * enclosing object initializer runs it in whichever JVM executes the
  * kernel (driver in local mode, each executor on a cluster).
  */
object ImageIoDefaults {
  javax.imageio.ImageIO.setUseCache(false)

  /** Force object initialization (and with it `setUseCache(false)`). */
  def ensure(): Unit = ()
}
