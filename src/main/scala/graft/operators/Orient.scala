package graft.operators

/**
 * EXIF orientation application — the pixel-side companion of
 * `Exif.scala`: cameras store the raster unrotated and record the
 * intended view as orientation tag 1-8; a training pipeline must
 * APPLY the orientation before any resize/hash/embed step or mirrored
 * and rotated near-duplicates slip past every fingerprint.
 *
 * The eight mappings per the EXIF (CIPA DC-008 / TIFF 6.0) tag
 * definition, source (x,y) in a w×h raster:
 *   1 identity            2 mirror-H: (w-1-x, y)
 *   3 rotate 180          4 mirror-V: (x, h-1-y)
 *   5 transpose: (y, x)   6 rotate 90 CW: (h-1-y, x)
 *   7 transverse          8 rotate 270 CW: (y, w-1-x)
 * Orientations 5-8 swap the output dimensions to h×w.
 *
 * Scale shape: stateless per-row map over pixel arrays.
 */
object Orient {

  /** Apply orientation `o` (1-8); returns (pixels, outW, outH). */
  def apply(px: Array[Int], w: Int, h: Int, o: Int): (Array[Int], Int, Int) = {
    require(px.length == w * h, "pixel count mismatch")
    require(o >= 1 && o <= 8, s"bad orientation $o")
    val swap = o >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Int](px.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (dx, dy) = o match {
          case 1 => (x, y)
          case 2 => (w - 1 - x, y)
          case 3 => (w - 1 - x, h - 1 - y)
          case 4 => (x, h - 1 - y)
          case 5 => (y, x)
          case 6 => (h - 1 - y, x)
          case 7 => (h - 1 - y, w - 1 - x)
          case 8 => (y, w - 1 - x)
        }
        out(dy * ow + dx) = px(y * w + x)
        x += 1
      }
      y += 1
    }
    (out, ow, oh)
  }
}
