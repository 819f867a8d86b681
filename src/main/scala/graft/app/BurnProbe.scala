package graft.app
object BurnProbe {
  def main(args: Array[String]): Unit = {
    val nThreads = args.headOption.getOrElse("32").toInt
    val pat = java.util.regex.Pattern.compile("([A-Z][\\w.&'-]*(?: [A-Z][\\w.&'-]*)*) acquired ([A-Z][\\w.&'-]*(?: [A-Z][\\w.&'-]*)*) in (\\d{4})\\.")
    val line = "Quantum Dynamics Inc acquired Apex Systems in 2014. see the shared notes for additional context."
    val counts = new java.util.concurrent.atomic.AtomicLong()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val threads = (1 to nThreads).map { _ =>
      new Thread(() => {
        var c = 0L
        while (!stop.get()) {
          val m = pat.matcher(line)
          if (m.find()) c += 1
          // also digest + string alloc like the real pipeline
          graft.functions.Ids.stableUuid("g", line, "idx:1")
        }
        counts.addAndGet(c)
      })
    }
    threads.foreach(_.start())
    Thread.sleep(15000)
    stop.set(true)
    threads.foreach(_.join())
    println(s"[burn] threads=$nThreads total=${counts.get()} perSec=${counts.get()/15}")
  }
}
