package graft.cli

/** K7 failure-notification seam — the engine-side twin of the reference's
  * SNS alerting wrapper (`click_exception.py:7-98`): any exception escaping
  * a CLI routine is formatted exactly like the reference's SNS message
  * ("CLI routine '<name> <args>' failed raising error: '<type>: <msg>'."),
  * published to the pluggable [[Alerting.AlertSink]], and re-raised so the
  * caller still sees the original error. The default sink writes to stderr;
  * an SNS/webhook/email sink plugs in without touching the CLI twins (this
  * environment has no AWS SDK, so the transport is the seam, as with
  * TransferBaltrad.RemoteSource).
  */
object Alerting {

  trait AlertSink {
    def alert(subject: String, message: String): Unit
  }

  /** Default: warn-and-continue channel on stderr. */
  object StderrSink extends AlertSink {
    override def alert(subject: String, message: String): Unit =
      System.err.println(s"[alert] $subject: $message")
  }

  @volatile var sink: AlertSink = StderrSink

  /** Run `body`; on any exception publish the reference-format failure
    * message (subject + routine + original args + error) and re-raise.
    * Alert-delivery failures never mask the original error.
    */
  def guarded[T](infoName: String, args: Seq[String], subject: String)(body: => T): T =
    try body catch {
      case e: Throwable =>
        val msg = s"CLI routine '$infoName ${args.mkString(" ")}' failed " +
          s"raising error: '${e.getClass.getName}: ${e.getMessage}'."
        try sink.alert(subject, msg) catch { case _: Exception => () }
        throw e
    }
}
