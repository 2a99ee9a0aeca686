package graft.ext

object Vp8State {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "python"
    val data = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"/tmp/vp8x/fixtures/$name.webp"))
    Vp8.debugState = s => println(s)
    Vp8.debugSkipFilter = true
    Vp8.decode(data)
    Vp8.debugState = null
    Vp8.debugSkipFilter = false
  }
}
