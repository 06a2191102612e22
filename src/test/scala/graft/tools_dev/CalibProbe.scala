package graft.tools_dev

object CalibProbe {
  def main(args: Array[String]): Unit = {
    def pass(): Long = {
      var x = 0x9E3779B97F4A7C15L; var i = 0
      while (i < (1 << 26)) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      x
    }
    val sink = pass()
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime(); val r = pass()
      val t = (System.nanoTime() - t0) / 1e6
      if (r == sink - 1) print("")
      println(f"CALIB cpu pass$i = $t%.1f ms")
    }
    // disk: write+fsync 100 x 64KB files to /tmp
    val dir = java.nio.file.Files.createTempDirectory("calib-io")
    val buf = new Array[Byte](65536)
    val t0 = System.nanoTime()
    (1 to 100).foreach { i =>
      val p = dir.resolve(s"f$i")
      val ch = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
      ch.write(java.nio.ByteBuffer.wrap(buf)); ch.force(true); ch.close()
    }
    println(f"CALIB io 100x64KB fsync = ${(System.nanoTime()-t0)/1e6}%.1f ms")
    (1 to 100).foreach(i => java.nio.file.Files.delete(dir.resolve(s"f$i")))
    java.nio.file.Files.delete(dir)
  }
}
